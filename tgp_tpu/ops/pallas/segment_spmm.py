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

__all__ = ["sorted_segment_sum_pallas", "sorted_segment_sum_grouped",
           "spmm_sorted", "sort_edges_csr"]

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
            # one-hot in the message dtype (1.0/0.0 are exact in bf16);
            # accumulation stays f32 via preferred_element_type
            oh = ((pos >= lo) & (pos < hi)).astype(msgs_hbm.dtype)
            return acc + jnp.dot(oh, chunk,
                                 preferred_element_type=jnp.float32,
                                 precision=precision)

        acc = jnp.zeros((block_rows, F), jnp.float32)
        acc = jax.lax.fori_loop(0, n_chunks, chunk_body, acc)
        out_ref[:] = acc.astype(out_ref.dtype)

    pl.run_scoped(
        body,
        # scratch must match the HBM source dtype (a bf16→f32 DMA is an
        # element-type mismatch at the Mosaic level)
        msgs_buf=pltpu.VMEM((2, block_edges, F), msgs_hbm.dtype),
        msg_sem=pltpu.SemaphoreType.DMA((2,)),
    )


def _auto_blocks(E: int, F: int, num_rows: int, itemsize: int):
    """Measured-best block sizes (scripts/exp_kernel_sweep.py, TPU v5e,
    E=1M/F=128/bf16: 4.94 ms at 128/512 → 4.64 ms at 256/2048), guarded by
    divisibility and a ~4 MB VMEM budget for the double-buffered msgs."""
    block_rows = 256 if num_rows % 256 == 0 else 128
    budget = 4 * 1024 * 1024  # 2 double-buffered msg buffers ≤ ~1/4 of VMEM
    # VMEM-safe edge-chunk cap — for very wide F this drops below the
    # throughput-preferred 512 floor; VMEM safety wins (a 512-edge chunk at
    # F=4096 f32 would be 16 MB double-buffered and overflow VMEM)
    cap = max((budget // (2 * F * itemsize)) // 128 * 128, 128)
    block_edges = min(2048 if E >= 1 << 18 else 512, cap)
    return block_rows, block_edges


def sorted_segment_sum_pallas(msgs: jax.Array, rids: jax.Array,
                              row_ptr: jax.Array, num_rows: int,
                              *, block_rows: int | None = None,
                              block_edges: int | None = None,
                              precision=jax.lax.Precision.DEFAULT,
                              interpret: bool = False) -> jax.Array:
    """``out[r] = Σ_{e: rids[e]==r} msgs[e]`` for **sorted** ``rids [E]``.

    ``rids`` itself is only used to validate the contract shape — the kernel
    works purely off ``row_ptr`` (padding edges must sort past
    ``row_ptr[num_rows]``).  ``num_rows`` must be a multiple of
    ``block_rows``.  Block sizes default to the measured-best choice for the
    shape (:func:`_auto_blocks`).

    ``precision``: DEFAULT (bf16 MXU passes, ~2e-3 rel err on the summed
    messages, 1.4x faster than XLA scatter-add) or HIGHEST (3-pass fp32
    emulation, bit-accurate to ~1e-6 but ~7x slower — use for parity
    checks only).
    """
    E, F = msgs.shape
    del rids
    if F % 128 != 0:
        # Mosaic tiles the lane (minor) axis at 128: a narrower F makes the
        # per-chunk DMA slice unaligned and fails to compile on hardware
        # (caught by the on-chip gate, tests/tpu/test_tpu_gate.py — hidden
        # widths like 32 hit this).  Pad features up to the lane width; the
        # zero lanes cost bandwidth but keep every slice tile-aligned.
        F_pad = ((F + 127) // 128) * 128
        msgs = jnp.pad(msgs, ((0, 0), (0, F_pad - F)))
        out = sorted_segment_sum_pallas(
            msgs, None, row_ptr, num_rows, block_rows=block_rows,
            block_edges=block_edges, precision=precision,
            interpret=interpret)
        return out[:, :F]
    auto_br, auto_be = _auto_blocks(E, F, num_rows, msgs.dtype.itemsize)
    block_rows = block_rows or auto_br
    block_edges = block_edges or auto_be
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


# ---------------------------------------------------------------------------
# Grouped (work-item) sorted-CSR kernel — round-3 rewrite of the in-block
# reduction pipeline (VERDICT r2 #3).
#
# The round-2 kernel serialized per row-block: a run_scoped double-buffered
# DMA chain restarts at every grid step, so chunk loads never overlap
# ACROSS blocks, and the block sweep showed the total nearly independent of
# block sizes (~4.6-4.9 ms at E=1M) — classic per-step latency, not
# bandwidth.  This version flattens (row_block, chunk) pairs into a static
# 1-D work-item grid, megablox/gmm-style:
#
#   * scalar-prefetched item arrays (block_id, chunk_id, is_first) computed
#     from row_ptr with O(T) vectorized ops inside jit;
#   * message chunks arrive via a BlockSpec whose index_map reads the
#     prefetched chunk_id — Mosaic double-buffers them across grid steps
#     automatically (continuous streaming, no manual DMA);
#   * the output row-block is revisited by all its items consecutively, so
#     Mosaic keeps the accumulator in VMEM and writes it once when the
#     block changes (the standard revisiting-reduction pattern);
#   * padding items point at a dedicated all-zero chunk past E_pad and
#     carry is_first=0, so they add nothing to the last block.
# ---------------------------------------------------------------------------


def _grouped_kernel(block_ref, chunk_ref, first_ref, lo_ref, hi_ref,
                    msgs_ref, out_ref, *, block_edges, precision):
    i = pl.program_id(0)
    e0 = chunk_ref[i] * block_edges

    @pl.when(first_ref[i] == 1)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    lo = lo_ref[:, 0:1]  # [BR, 1] per-row global edge bounds
    hi = hi_ref[:, 0:1]
    pos = e0 + jax.lax.broadcasted_iota(
        jnp.int32, (lo_ref.shape[0], block_edges), 1)
    oh = ((pos >= lo) & (pos < hi)).astype(msgs_ref.dtype)
    out_ref[:] += jnp.dot(oh, msgs_ref[:],
                          preferred_element_type=jnp.float32,
                          precision=precision)


def _grouped_kernel_w(block_ref, chunk_ref, first_ref, lo_ref, hi_ref,
                      w_ref, msgs_ref, out_ref, *, block_edges, precision):
    """Weight-fused twin of :func:`_grouped_kernel`: computes per-row
    ``Σ_e w_e · msgs_e`` by folding the edge weight into the membership
    one-hot — the caller passes UNWEIGHTED gathered rows and never
    materializes the ``[E, F]`` weighted-messages array (a full HBM
    round-trip per pass, ~0.8 ms at E=1M×128 bf16 — round-5 trace).

    The weights arrive as a ``(1, 8, block_edges//8)`` VMEM block (a flat
    ``[block_edges]`` block violates Mosaic's (8,128) tiling rule), so the
    chunk dot splits into 8 sub-chunk dots — each broadcasts one weight
    ROW against its one-hot slice, no in-kernel reshape/relayout."""
    i = pl.program_id(0)
    e0 = chunk_ref[i] * block_edges
    sc = block_edges // 8

    @pl.when(first_ref[i] == 1)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    lo = lo_ref[:, 0:1]
    hi = hi_ref[:, 0:1]
    w8 = w_ref[0]  # [8, sc]
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for s in range(8):
        pos = (e0 + s * sc) + jax.lax.broadcasted_iota(
            jnp.int32, (lo_ref.shape[0], sc), 1)
        oh = ((pos >= lo) & (pos < hi)).astype(jnp.float32)
        ohw = (oh * w8[s: s + 1, :].astype(jnp.float32)).astype(
            msgs_ref.dtype)
        acc += jnp.dot(ohw, msgs_ref[s * sc: (s + 1) * sc, :],
                       preferred_element_type=jnp.float32,
                       precision=precision)
    out_ref[:] += acc


def _grouped_items(row_ptr, num_rows, block_rows, block_edges, n_chunks_pad):
    """Static-size work-item arrays from the CSR pointer (all jnp, jit-ok).

    Returns int32 ``(block_id, chunk_id, is_first) [T_max]`` where
    ``T_max = n_chunks_pad + n_blocks`` bounds Σ_b max(chunks(b), 1); padding
    items map to the all-zero chunk ``n_chunks_pad`` of the LAST block (so
    the out-block visit order stays contiguous and they contribute 0)."""
    n_blocks = num_rows // block_rows
    t_max = n_chunks_pad + n_blocks
    b = jnp.arange(n_blocks, dtype=jnp.int32)
    start = row_ptr[b * block_rows] // block_edges
    end = (row_ptr[(b + 1) * block_rows] + block_edges - 1) // block_edges
    n_items = jnp.maximum(end - start, 1)
    offs = jnp.cumsum(n_items)  # exclusive end per block
    total = offs[-1]
    i = jnp.arange(t_max, dtype=jnp.int32)
    blk = jnp.searchsorted(offs, i, side="right").astype(jnp.int32)
    pad = i >= total
    blk = jnp.where(pad, n_blocks - 1, blk)
    base = jnp.where(blk > 0, offs[jnp.maximum(blk - 1, 0)], 0)
    chunk = (start[blk] + (i - base)).astype(jnp.int32)
    chunk = jnp.where(pad, n_chunks_pad, chunk)
    is_first = ((i == base) & ~pad).astype(jnp.int32)
    return blk, chunk, is_first, t_max


def sorted_segment_sum_grouped(msgs: jax.Array, rids, row_ptr: jax.Array,
                               num_rows: int, *,
                               block_rows: int | None = None,
                               block_edges: int | None = None,
                               w: jax.Array | None = None,
                               prepadded: bool = False,
                               precision=jax.lax.Precision.DEFAULT,
                               interpret: bool = False) -> jax.Array:
    """Work-item-grid twin of :func:`sorted_segment_sum_pallas` (same
    contract: receiver-sorted ``msgs [E, F]``, CSR ``row_ptr [num_rows+1]``,
    ``num_rows % block_rows == 0``).  Accumulates in f32 and returns
    ``[num_rows, F]`` cast back to ``msgs.dtype`` (bf16 in → bf16 out).

    ``w`` ([E] per-edge weights) is multiplied IN-KERNEL (folded into the
    membership one-hot), so callers can pass unweighted gathered rows and
    skip materializing the weighted ``[E, F]`` messages array.
    ``prepadded=True`` asserts the caller already padded the edge axis to
    ``(n_chunks+1)·block_edges`` with a trailing all-zero chunk (pad the
    [E] index/weight arrays before the gather — padding ``msgs`` itself is
    a full HBM round-trip, ~1.5 ms at E=1M×128).

    Block sizes default to :func:`_auto_blocks` (the round-3 on-chip sweep
    put (256, 2048) first at E=1M within a ~10% spread of (128, 1024) and
    (256, 4096); scripts/exp_r3_kernel.py)."""
    E, F = msgs.shape
    del rids
    if F % 128 != 0:  # lane-tile alignment (see sorted_segment_sum_pallas)
        F_pad = ((F + 127) // 128) * 128
        out = sorted_segment_sum_grouped(
            jnp.pad(msgs, ((0, 0), (0, F_pad - F))), None, row_ptr, num_rows,
            block_rows=block_rows, block_edges=block_edges, w=w,
            prepadded=prepadded, precision=precision, interpret=interpret)
        return out[:, :F]
    auto_br, auto_be = _auto_blocks(E, F, num_rows, msgs.dtype.itemsize)
    block_rows = block_rows or auto_br
    block_edges = block_edges or auto_be
    assert num_rows % block_rows == 0, (num_rows, block_rows)
    assert block_edges % 128 == 0
    if prepadded:
        assert E % block_edges == 0 and E >= 2 * block_edges, (
            E, block_edges)
        n_chunks_pad = E // block_edges - 1  # last chunk is the zero pad
    else:
        n_chunks_pad = (E + block_edges - 1) // block_edges
        E_pad = (n_chunks_pad + 1) * block_edges  # +1 zero chunk for padding
        msgs = jnp.concatenate([msgs, jnp.zeros((E_pad - E, F), msgs.dtype)])
        if w is not None:
            w = jnp.concatenate([w, jnp.zeros(E_pad - E, w.dtype)])

    blk, chunk, is_first, t_max = _grouped_items(
        row_ptr.astype(jnp.int32), num_rows, block_rows, block_edges,
        n_chunks_pad)

    lo = jnp.broadcast_to(row_ptr[:num_rows, None], (num_rows, _CHUNK))
    hi = jnp.broadcast_to(row_ptr[1: num_rows + 1, None], (num_rows, _CHUNK))

    in_specs = [
        pl.BlockSpec((block_rows, _CHUNK),
                     lambda i, b, c, f: (b[i], 0),
                     memory_space=pltpu.VMEM),  # lo
        pl.BlockSpec((block_rows, _CHUNK),
                     lambda i, b, c, f: (b[i], 0),
                     memory_space=pltpu.VMEM),  # hi
    ]
    operands = [lo, hi]
    if w is None:
        kernel = functools.partial(_grouped_kernel,
                                   block_edges=block_edges,
                                   precision=precision)
    else:
        kernel = functools.partial(_grouped_kernel_w,
                                   block_edges=block_edges,
                                   precision=precision)
        # per-chunk weights as (chunks, 8, be//8): the trailing two dims
        # satisfy Mosaic's (8,128)-divisible-or-full tiling rule for every
        # block_edges the auto-tuner picks (2048→(8,256), 512→(8,64)=full)
        in_specs.append(pl.BlockSpec((1, 8, block_edges // 8),
                                     lambda i, b, c, f: (c[i], 0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(w.reshape(-1, 8, block_edges // 8))
    in_specs.append(pl.BlockSpec((block_edges, F),
                                 lambda i, b, c, f: (c[i], 0),
                                 memory_space=pltpu.VMEM))  # msgs chunk
    operands.append(msgs)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(t_max,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (block_rows, F), lambda i, b, c, f: (b[i], 0),
                memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((num_rows, F), jnp.float32),
        interpret=interpret,
    )(blk, chunk, is_first, *operands)
    return out.astype(msgs.dtype)


def _banded_kernel(row_ptr_ref, win_base_ref, lo_ref, hi_ref, x_hbm,
                   send_hbm, w_hbm, out_ref, *, block_rows, block_edges,
                   window, precision):
    rb = pl.program_id(0)
    r0 = rb * block_rows
    e_start = row_ptr_ref[r0]
    e_end = row_ptr_ref[r0 + block_rows]
    # win_base is host-aligned to 8 ((min_send // 8) * 8); Mosaic cannot
    # prove that for a traced value, so assert it — without the hint large
    # windows fail to compile ("tile index in dimension 0 not divisible by
    # the tiling (8)", found by scripts/exp_r3_banded.py on-chip)
    base = pl.multiple_of(win_base_ref[rb], 8)
    F = out_ref.shape[-1]

    c0 = e_start // block_edges
    n_chunks = jnp.maximum((e_end + block_edges - 1) // block_edges - c0, 0)

    def body(x_win, send_buf, w_buf, x_sem, meta_sem):
        # window of x rows covering every sender this row-block can touch
        pltpu.make_async_copy(
            x_hbm.at[pl.ds(base, window), :], x_win, x_sem).start()

        lo = lo_ref[:, 0:1]
        hi = hi_ref[:, 0:1]

        def make_dma(slot, c):
            # Mosaic requires sublane-aligned (×8) slices, so copy the whole
            # aligned 8-row group containing chunk row g and select in-VMEM.
            g8 = ((c0 + c) // 8) * 8
            return (
                pltpu.make_async_copy(send_hbm.at[pl.ds(g8, 8), :],
                                      send_buf.at[slot], meta_sem.at[slot, 0]),
                pltpu.make_async_copy(w_hbm.at[pl.ds(g8, 8), :],
                                      w_buf.at[slot], meta_sem.at[slot, 1]),
            )

        @pl.when(n_chunks > 0)
        def _():
            for d in make_dma(0, 0):
                d.start()

        pltpu.make_async_copy(
            x_hbm.at[pl.ds(base, window), :], x_win, x_sem).wait()

        def chunk_body(c, acc):
            slot = c % 2

            @pl.when(c + 1 < n_chunks)
            def _():
                for d in make_dma((c + 1) % 2, c + 1):
                    d.start()

            for d in make_dma(slot, c):
                d.wait()
            # select chunk row (c0+c) % 8 out of the aligned 8-row group via
            # a sublane-masked reduction (dynamic sublane slicing is not
            # allowed in VMEM)
            gmod = (c0 + c) % 8
            sub = jax.lax.broadcasted_iota(jnp.int32, (8, block_edges), 0)
            send_row = jnp.sum(
                jnp.where(sub == gmod, send_buf[slot], 0),
                axis=0, keepdims=True)  # [1, BE] int32 (global sender ids)
            w_row = jnp.sum(
                jnp.where(sub == gmod, w_buf[slot], 0.0),
                axis=0, keepdims=True)  # [1, BE] f32

            # gather as a one-hot matmul: S_ohᵀ[j, e] = w_e·1[send_e == base+j]
            iota_w = base + jax.lax.broadcasted_iota(
                jnp.int32, (window, block_edges), 0)
            # s_oht must match x's dtype for the MXU dot (bf16 weights
            # are exact for typical GCN-normalized values; f32 x keeps f32)
            s_oht = jnp.where(send_row == iota_w, w_row,
                              0.0).astype(x_hbm.dtype)
            msgs = jax.lax.dot_general(
                s_oht, x_win[:], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision)  # [BE, F]

            # scatter via the row-bounds one-hot (same as the unfused kernel)
            e0 = (c0 + c) * block_edges
            pos = e0 + jax.lax.broadcasted_iota(
                jnp.int32, (block_rows, block_edges), 1)
            r_oh = ((pos >= lo) & (pos < hi)).astype(jnp.float32)
            return acc + jnp.dot(r_oh, msgs,
                                 preferred_element_type=jnp.float32,
                                 precision=precision)

        acc = jnp.zeros((block_rows, F), jnp.float32)
        acc = jax.lax.fori_loop(0, n_chunks, chunk_body, acc)
        out_ref[:] = acc.astype(out_ref.dtype)

    pl.run_scoped(
        body,
        # scratch dtype must match the HBM source (a bf16→f32 DMA is an
        # element-type mismatch at the Mosaic level — caught on-chip by
        # scripts/exp_r3_banded.py)
        x_win=pltpu.VMEM((window, x_hbm.shape[-1]), x_hbm.dtype),
        send_buf=pltpu.VMEM((2, 8, block_edges), jnp.int32),
        w_buf=pltpu.VMEM((2, 8, block_edges), jnp.float32),
        x_sem=pltpu.SemaphoreType.DMA,
        meta_sem=pltpu.SemaphoreType.DMA((2, 2)),
    )


def banded_sorted_spmm_pallas(x, senders_sorted, row_ptr, w_sorted,
                              num_rows: int, *, window: int = 512,
                              block_rows: int = 128, block_edges: int = 512,
                              precision=jax.lax.Precision.DEFAULT,
                              interpret: bool = False) -> jax.Array:
    """Fused gather+segment-sum SpMM for **banded** sorted layouts.

    ``out[r] = Σ_{e: recv_e == r} w_e · x[send_e]`` with the gather done
    INSIDE the kernel: each receiver row-block DMAs one ``[window, F]``
    slice of ``x`` into VMEM and turns the per-edge gather into a one-hot
    matmul on the MXU (``S_ohᵀ @ x_win``), so the per-edge random-row HBM
    gather and the ``[E, F]`` message materialization both disappear.

    Band contract: edges sorted by receiver, and for every ``block_rows``
    receiver block the senders span fewer than ``window − 8`` rows.  Batches
    of graphs ≤ ``window/2`` nodes satisfy this by construction (nodes are
    packed per graph, edges are intra-graph); large graphs need a bandwidth-
    reducing node order (e.g. RCM) first.  Out-of-window senders contribute
    ZERO silently — use :func:`check_band_contract` in tests/loaders.

    FLOP cost is ``E·(window + block_rows)·F`` MACs — worth it because the
    MXU is otherwise idle while HBM serves random gathers.
    """
    E, = senders_sorted.shape
    N_x, F = x.shape
    assert num_rows % block_rows == 0
    assert block_edges % 128 == 0 and window % 8 == 0
    nblk = num_rows // block_rows

    # pad x so any clipped window fits
    N_pad = max(N_x, window)
    if N_pad != N_x:
        x = jnp.concatenate([x, jnp.zeros((N_pad - N_x, F), x.dtype)])

    # per-row-block sender window base (trace-time segment-min).  Edge slot e
    # belongs to row block rb iff row_ptr[rb·BR] ≤ e < row_ptr[(rb+1)·BR]; a
    # scatter of 1s at the block-start offsets + cumsum yields the block id.
    starts = row_ptr[: num_rows + 1 : block_rows]  # [nblk+1] edge offsets
    is_start = jnp.zeros(E + 1, jnp.int32).at[
        jnp.clip(starts, 0, E)].add(1)[:E]
    blk_of_edge = jnp.clip(jnp.cumsum(is_start) - 1, 0, nblk - 1)
    send_key = jnp.where(jnp.arange(E) < row_ptr[num_rows],
                         senders_sorted.astype(jnp.int32), N_pad)
    min_send = jnp.full(nblk, N_pad, jnp.int32).at[blk_of_edge].min(send_key)
    win_base = jnp.clip((min_send // 8) * 8, 0, max(N_pad - window, 0))

    # chunk-major 2-D metadata; rows padded to a multiple of 8 so the
    # sublane-aligned [8, BE] DMA groups never run off the end
    n_chunk_rows = (E + block_edges - 1) // block_edges + 1
    n_chunk_rows = ((n_chunk_rows + 7) // 8) * 8
    E_pad = n_chunk_rows * block_edges
    send2d = jnp.concatenate(
        [senders_sorted.astype(jnp.int32),
         jnp.zeros(E_pad - E, jnp.int32)]).reshape(-1, block_edges)
    w2d = jnp.concatenate(
        [w_sorted.astype(jnp.float32),
         jnp.zeros(E_pad - E, jnp.float32)]).reshape(-1, block_edges)

    lo = jnp.broadcast_to(row_ptr[:num_rows, None], (num_rows, _CHUNK))
    hi = jnp.broadcast_to(row_ptr[1 : num_rows + 1, None],
                          (num_rows, _CHUNK))

    return pl.pallas_call(
        functools.partial(_banded_kernel, block_rows=block_rows,
                          block_edges=block_edges, window=window,
                          precision=precision),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nblk,),
            in_specs=[
                pl.BlockSpec((block_rows, _CHUNK), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),  # lo
                pl.BlockSpec((block_rows, _CHUNK), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),  # hi
                pl.BlockSpec(memory_space=pl.ANY),      # x [N_pad, F]
                pl.BlockSpec(memory_space=pl.ANY),      # send2d
                pl.BlockSpec(memory_space=pl.ANY),      # w2d
            ],
            out_specs=pl.BlockSpec(
                (block_rows, F), lambda i, *_: (i, 0),
                memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((num_rows, F), x.dtype),
        interpret=interpret,
    )(row_ptr, win_base, lo, hi, x, send2d, w2d)


def check_band_contract(senders, receivers, edge_mask, num_rows,
                        block_rows=128, window=512):
    """Host-side validation of the band contract (run in loaders/tests, not
    under jit): True iff every receiver row-block's senders span < window−8."""
    import numpy as np

    s = np.asarray(senders)[np.asarray(edge_mask)]
    r = np.asarray(receivers)[np.asarray(edge_mask)]
    for rb in range(0, num_rows, block_rows):
        sel = (r >= rb) & (r < rb + block_rows)
        if sel.any():
            span = s[sel].max() - s[sel].min()
            if span >= window - 8:
                return False
    return True


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _banded_spmm_vjp(x, senders_sorted, receivers_sorted, w_sorted,
                     num_rows, window, interpret=False):
    rows_pad = ((num_rows + 127) // 128) * 128
    # no clip: sort_edges_csr marks padding with receiver −1 (sorted last);
    # segment_sum DROPS out-of-range ids, while clipping counted padding
    # into row 0 and shifted every row's [lo, hi) CSR bounds
    counts = jax.ops.segment_sum(
        jnp.ones(receivers_sorted.shape[0], jnp.int32),
        receivers_sorted,
        num_segments=rows_pad)
    row_ptr = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(counts).astype(jnp.int32)])
    out = banded_sorted_spmm_pallas(
        x, senders_sorted, row_ptr, w_sorted, rows_pad, window=window,
        interpret=interpret)
    return out[:num_rows]


def _banded_fwd(x, senders_sorted, receivers_sorted, w_sorted, num_rows,
                window, interpret=False):
    out = _banded_spmm_vjp(x, senders_sorted, receivers_sorted, w_sorted,
                           num_rows, window, interpret)
    return out, (x, senders_sorted, receivers_sorted, w_sorted)


def _banded_bwd(num_rows, window, interpret, res, g):
    x, s, r, w = res
    # d_x[j] = Σ_{e: send_e == j} w_e g[recv_e]  (transposed SpMM — XLA
    # scatter; acceptable because backward runs once per step vs the
    # forward's many invocations, and the sender axis is unsorted here)
    safe_r = jnp.clip(r, 0, num_rows - 1)
    d_msgs = g[safe_r] * w[:, None]
    d_x = jax.ops.segment_sum(d_msgs, jnp.clip(s, 0, x.shape[0] - 1),
                              num_segments=x.shape[0])
    # d_w[e] = <x[send_e], g[recv_e]>
    d_w = jnp.sum(x[jnp.clip(s, 0, x.shape[0] - 1)] * g[safe_r], axis=-1)
    return d_x, None, None, d_w


_banded_spmm_vjp.defvjp(_banded_fwd, _banded_bwd)


def spmm_banded(x, senders_sorted, receivers_sorted, w_sorted, num_rows: int,
                window: int = 512, interpret: bool = False):
    """Differentiable fused banded SpMM (forward = Pallas fused kernel,
    backward = XLA transposed scatter)."""
    return _banded_spmm_vjp(x, senders_sorted, receivers_sorted, w_sorted,
                            num_rows, window, interpret)


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


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _segment_sum_sorted_vjp(msgs, receivers_sorted, num_rows, interpret):
    # pad to 256 so _auto_blocks can pick the faster 256-row blocks
    rows_pad = ((num_rows + 255) // 256) * 256
    counts = jax.ops.segment_sum(
        jnp.ones(receivers_sorted.shape[0], jnp.int32), receivers_sorted,
        num_segments=rows_pad)
    row_ptr = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(counts).astype(jnp.int32)])
    # round-3: the grouped work-item grid is the faster pipeline on chip
    # (1.76 vs 1.88 ms at E=1M bf16, scripts/exp_r3_kernel.py) and the one
    # whose streaming Mosaic double-buffers across blocks
    out = sorted_segment_sum_grouped(msgs, receivers_sorted, row_ptr,
                                     rows_pad, interpret=interpret)
    return out[:num_rows]


def _sss_fwd(msgs, receivers_sorted, num_rows, interpret):
    return (_segment_sum_sorted_vjp(msgs, receivers_sorted, num_rows,
                                    interpret), receivers_sorted)


def _sss_bwd(num_rows, interpret, receivers_sorted, g):
    # VJP of a segment-sum is a plain gather: d_msgs[e] = g[rid_e]
    return (g[jnp.clip(receivers_sorted, 0, num_rows - 1)], None)


_segment_sum_sorted_vjp.defvjp(_sss_fwd, _sss_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _segment_sum_sorted_csr_vjp(msgs, receivers_sorted, row_ptr,
                                num_rows, interpret):
    rows_pad = row_ptr.shape[0] - 1
    out = sorted_segment_sum_grouped(msgs, receivers_sorted, row_ptr,
                                     rows_pad, interpret=interpret)
    return out[:num_rows]


def _sss_csr_fwd(msgs, receivers_sorted, row_ptr, num_rows, interpret):
    return (_segment_sum_sorted_csr_vjp(msgs, receivers_sorted, row_ptr,
                                        num_rows, interpret),
            receivers_sorted)


def _sss_csr_bwd(num_rows, interpret, receivers_sorted, g):
    return (g[jnp.clip(receivers_sorted, 0, num_rows - 1)], None, None)


_segment_sum_sorted_csr_vjp.defvjp(_sss_csr_fwd, _sss_csr_bwd)


def segment_sum_sorted(msgs, receivers_sorted, num_rows: int,
                       interpret: bool = False, row_ptr=None):
    """Convenience wrapper for model code: receiver-sorted messages →
    per-row sums via the Pallas kernel (differentiable — the backward pass
    is an XLA gather), handling row padding to the 128-row grid and
    building ``row_ptr`` on the fly.

    Pass a precomputed ``row_ptr`` (``[rows_pad+1]`` with rows_pad a
    256-multiple ≥ num_rows, e.g. ``GraphBatch.row_ptr`` from the collator)
    to skip the in-step CSR build — the counts scatter alone costs ~9 ms at
    E=1M (round-5 trace), and the connectivity is static across steps.

    Padding edge slots may point at row 0 with zero-valued messages — they
    contribute nothing to the sum, and their cotangent ``g[0]`` is
    multiplied by zero downstream of the weighting."""
    if row_ptr is not None:
        rows_pad = row_ptr.shape[0] - 1
        assert rows_pad % 256 == 0 and rows_pad >= num_rows, (
            rows_pad, num_rows)
        return _segment_sum_sorted_csr_vjp(msgs, receivers_sorted, row_ptr,
                                           num_rows, interpret)
    return _segment_sum_sorted_vjp(msgs, receivers_sorted, num_rows,
                                   interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def spmm_csr(h, w, w_t, senders, receivers, row_ptr,
             receivers_t, senders_t, row_ptr_t, num_rows, interpret=False):
    """SpMM ``out[r] = Σ_{e: recv=r} w_e · h[send_e]`` over a
    receiver-sorted static-CSR edge list, with a **scatter-free backward**.

    The VJP w.r.t. ``h`` is an SpMM over Aᵀ; with the sender-sorted
    transpose layout precomputed by the collator
    (``GraphBatch.{senders_t, receivers_t, edge_weight_t, row_ptr_t}``) it
    runs as gather + Pallas sorted segment-sum instead of XLA's serialized
    random scatter-add (15 ms → ~4 ms at E=1M, f32[65k,128] —
    scripts/exp_r5_step_trace.py round 5).

    ``w_t`` MUST equal ``w[argsort(senders)]`` — the caller passes the
    static ``edge_weight_t`` (or a statically-masked variant).  Gradients
    w.r.t. ``w`` are the standard SDDMM; ``w_t`` is treated as an
    independent constant (zero cotangent) since it aliases ``w``.
    """
    return _gather_kernel_pass(h, w, senders, row_ptr, num_rows, interpret)


def _gather_kernel_pass(x, w, idx, row_ptr, num_rows, interpret):
    """gather → weight-fused Pallas segment-sum, with the edge axis padded
    BEFORE the gather (index/weight [E] pads are ~100× cheaper than padding
    the [E, F] messages array)."""
    E = idx.shape[0]
    F = x.shape[1]
    rows_pad = row_ptr.shape[0] - 1
    br, be = _auto_blocks(E, F, rows_pad, x.dtype.itemsize)
    n_chunks = (E + be - 1) // be
    E_pad = (n_chunks + 1) * be
    idx_p = jnp.pad(idx, (0, E_pad - E))
    w_p = jnp.pad(w, (0, E_pad - E))
    # unweighted gather (padding slots read row 0); the edge weight is
    # folded into the kernel's membership one-hot (_grouped_kernel_w) —
    # the weighted [E_pad, F] messages array is never materialized
    rows = x[idx_p]
    out = sorted_segment_sum_grouped(
        rows, None, row_ptr, rows_pad, block_rows=br, block_edges=be,
        w=w_p, prepadded=True, interpret=interpret)
    return out[:num_rows]


def _spmm_csr_fwd(h, w, w_t, senders, receivers, row_ptr,
                  receivers_t, senders_t, row_ptr_t, num_rows, interpret):
    out = spmm_csr(h, w, w_t, senders, receivers, row_ptr,
                   receivers_t, senders_t, row_ptr_t, num_rows, interpret)
    return out, (h, w, w_t, senders, receivers, receivers_t, senders_t,
                 row_ptr_t)


def _spmm_csr_bwd(num_rows, interpret, res, g):
    h, w, w_t, senders, receivers, receivers_t, senders_t, row_ptr_t = res
    safe_rt = jnp.clip(receivers_t, 0, num_rows - 1)
    # d_h = Aᵀ g over the sender-sorted layout (all indices static)
    d_h = _gather_kernel_pass(g, w_t.astype(g.dtype), safe_rt, row_ptr_t,
                              num_rows, interpret)
    # d_w = SDDMM ⟨h[s], g[r]⟩ — dead-code-eliminated when edge weights
    # carry no gradient (the usual GCN case)
    safe_r = jnp.clip(receivers, 0, num_rows - 1)
    d_w = jnp.sum(h[senders].astype(jnp.float32)
                  * g[safe_r].astype(jnp.float32), axis=-1
                  ).astype(w.dtype)
    return (d_h.astype(h.dtype), d_w, jnp.zeros_like(w_t), None, None,
            None, None, None, None)


spmm_csr.defvjp(_spmm_csr_fwd, _spmm_csr_bwd)
