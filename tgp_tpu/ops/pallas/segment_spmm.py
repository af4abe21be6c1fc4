"""Pallas TPU kernel: segment-sum of receiver-sorted messages (the SpMM
core).

Layout contract: edges sorted by receiver; ``msgs [E, F]`` are the gathered,
weighted messages (``w_e · x[sender_e]`` — the gather itself is an efficient
XLA op); ``row_ptr [N+1]`` is the CSR indptr over receivers (scalar-prefetch
→ SMEM).  The kernel grids over receiver row-blocks.  Instead of loading
per-edge receiver ids, each block scalar-fills a ``[BR, 1]`` bounds scratch
from ``row_ptr`` once, then walks its edge range in 128-edge chunks
(aligned down to 128 — spill edges belong to neighboring blocks and fall
outside the bounds, so they self-mask), double-buffering the msg DMAs and
accumulating on the MXU:

    oh[b, e]  = (lo[b] ≤ e_global) & (e_global < hi[b])      (VPU compare)
    acc[b, f] += oh @ chunk                                   (MXU)

This replaces the XLA scatter-add lowering of ``jax.ops.segment_sum`` for
the hot MP/reduce path (SURVEY §7: "the single most load-bearing
primitive"); sorting is amortized — the graph layout is static across
training steps, so the loader can sort once.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["sorted_segment_sum_pallas", "spmm_sorted", "sort_edges_csr"]

_CHUNK = 128


def _kernel(row_ptr_ref, lo_ref, hi_ref, msgs_hbm, out_ref, *, block_rows,
            block_edges, precision):
    rb = pl.program_id(0)
    r0 = rb * block_rows
    e_start = row_ptr_ref[r0]
    e_end = row_ptr_ref[r0 + block_rows]
    F = out_ref.shape[-1]

    c0 = e_start // block_edges  # aligned-down first chunk
    n_chunks = jnp.maximum((e_end + block_edges - 1) // block_edges - c0, 0)

    def body(msgs_buf, msg_sem):
        lo = lo_ref[:, 0:1]  # [BR, 1] per-row edge-range bounds
        hi = hi_ref[:, 0:1]

        def make_dma(slot, c):
            g = c0 + c
            return pltpu.make_async_copy(
                msgs_hbm.at[pl.ds(g * block_edges, block_edges), :],
                msgs_buf.at[slot], msg_sem.at[slot])

        @pl.when(n_chunks > 0)
        def _():
            make_dma(0, 0).start()

        def chunk_body(c, acc):
            slot = c % 2

            @pl.when(c + 1 < n_chunks)
            def _():
                make_dma((c + 1) % 2, c + 1).start()

            make_dma(slot, c).wait()
            chunk = msgs_buf[slot]  # [CHUNK, F]

            e0 = (c0 + c) * block_edges
            pos = e0 + jax.lax.broadcasted_iota(
                jnp.int32, (block_rows, block_edges), 1)
            oh = ((pos >= lo) & (pos < hi)).astype(jnp.float32)
            return acc + jnp.dot(oh, chunk,
                                 preferred_element_type=jnp.float32,
                                 precision=precision)

        acc = jnp.zeros((block_rows, F), jnp.float32)
        acc = jax.lax.fori_loop(0, n_chunks, chunk_body, acc)
        out_ref[:] = acc.astype(out_ref.dtype)

    pl.run_scoped(
        body,
        msgs_buf=pltpu.VMEM((2, block_edges, F), jnp.float32),
        msg_sem=pltpu.SemaphoreType.DMA((2,)),
    )


def sorted_segment_sum_pallas(msgs: jax.Array, rids: jax.Array,
                              row_ptr: jax.Array, num_rows: int,
                              *, block_rows: int = 128,
                              block_edges: int = 512,
                              precision=jax.lax.Precision.DEFAULT,
                              interpret: bool = False) -> jax.Array:
    """``out[r] = Σ_{e: rids[e]==r} msgs[e]`` for **sorted** ``rids [E]``.

    ``rids`` itself is only used to validate the contract shape — the kernel
    works purely off ``row_ptr`` (padding edges must sort past
    ``row_ptr[num_rows]``).  ``num_rows`` must be a multiple of
    ``block_rows``.

    ``precision``: DEFAULT (bf16 MXU passes, ~2e-3 rel err on the summed
    messages, 1.4x faster than XLA scatter-add) or HIGHEST (3-pass fp32
    emulation, bit-accurate to ~1e-6 but ~7x slower — use for parity
    checks only).
    """
    E, F = msgs.shape
    del rids
    assert num_rows % block_rows == 0, (num_rows, block_rows)
    assert block_edges % 128 == 0
    # pad the edge axis so chunk DMAs never run off the end
    E_pad = ((E + block_edges - 1) // block_edges + 1) * block_edges
    msgs = jnp.concatenate([msgs, jnp.zeros((E_pad - E, F), msgs.dtype)])

    # per-row bounds, lane-broadcast so VMEM blocks are tile-aligned
    lo = jnp.broadcast_to(row_ptr[:num_rows, None], (num_rows, _CHUNK))
    hi = jnp.broadcast_to(row_ptr[1 : num_rows + 1, None],
                          (num_rows, _CHUNK))

    grid = (num_rows // block_rows,)
    return pl.pallas_call(
        functools.partial(_kernel, block_rows=block_rows,
                          block_edges=block_edges, precision=precision),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_rows, _CHUNK), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),  # lo
                pl.BlockSpec((block_rows, _CHUNK), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),  # hi
                pl.BlockSpec(memory_space=pl.ANY),      # msgs [E_pad, F]
            ],
            out_specs=pl.BlockSpec(
                (block_rows, F), lambda i, *_: (i, 0),
                memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((num_rows, F), msgs.dtype),
        interpret=interpret,
    )(row_ptr, lo, hi, msgs)


def sort_edges_csr(senders, receivers, edge_weight, edge_mask, num_rows):
    """Host/trace-time helper: sort edges by receiver (padding last) and
    build the CSR ``row_ptr``.  The permutation is static per graph layout —
    apply once in the loader."""
    r_key = jnp.where(edge_mask, receivers, num_rows)
    order = jnp.argsort(r_key)
    s_s = senders[order]
    r_s = jnp.where(edge_mask[order], receivers[order], -1)
    w_s = jnp.where(edge_mask[order], edge_weight[order], 0.0)
    counts = jax.ops.segment_sum(
        edge_mask.astype(jnp.int32), jnp.where(edge_mask, receivers, 0),
        num_segments=num_rows)
    row_ptr = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(counts).astype(jnp.int32)])
    return s_s, r_s, w_s, row_ptr


def spmm_sorted(senders_sorted, rids_sorted, row_ptr, edge_weight_sorted, x,
                num_rows, **kw):
    """SpMM over a receiver-sorted edge list: XLA gather + Pallas
    segment-sum."""
    msgs = x[senders_sorted] * edge_weight_sorted[:, None]
    return sorted_segment_sum_pallas(msgs, rids_sorted, row_ptr, num_rows,
                                     **kw)


import functools as _functools


@_functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _segment_sum_sorted_vjp(msgs, receivers_sorted, num_rows, interpret):
    rows_pad = ((num_rows + 127) // 128) * 128
    counts = jax.ops.segment_sum(
        jnp.ones(receivers_sorted.shape[0], jnp.int32), receivers_sorted,
        num_segments=rows_pad)
    row_ptr = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(counts).astype(jnp.int32)])
    out = sorted_segment_sum_pallas(msgs, receivers_sorted, row_ptr,
                                    rows_pad, interpret=interpret)
    return out[:num_rows]


def _sss_fwd(msgs, receivers_sorted, num_rows, interpret):
    return (_segment_sum_sorted_vjp(msgs, receivers_sorted, num_rows,
                                    interpret), receivers_sorted)


def _sss_bwd(num_rows, interpret, receivers_sorted, g):
    # VJP of a segment-sum is a plain gather: d_msgs[e] = g[rid_e]
    return (g[jnp.clip(receivers_sorted, 0, num_rows - 1)], None)


_segment_sum_sorted_vjp.defvjp(_sss_fwd, _sss_bwd)


def segment_sum_sorted(msgs, receivers_sorted, num_rows: int,
                       interpret: bool = False):
    """Convenience wrapper for model code: receiver-sorted messages →
    per-row sums via the Pallas kernel (differentiable — the backward pass
    is an XLA gather), handling row padding to the 128-row grid and
    building ``row_ptr`` on the fly.

    Padding edge slots may point at row 0 with zero-valued messages — they
    contribute nothing to the sum, and their cotangent ``g[0]`` is
    multiplied by zero downstream of the weighting."""
    return _segment_sum_sorted_vjp(msgs, receivers_sorted, num_rows,
                                   interpret)
