"""Pallas TPU kernel: banded SDDMM — per-edge ``⟨a[send_e], b[recv_e]⟩``.

Sampled dense-dense matmul is the edge-score primitive of the sparse loss
twins and attention-style poolers (reference analogue: the per-edge
``(S_i · S_j)`` products in ``sparse_*_loss``, tgp/utils/losses.py:126-215;
SURVEY §7 names a Pallas SDDMM among the TPU-native kernels).

The XLA lowering (``ops.sparse.sddmm``) is two random-row gathers that
materialize ``[E, F]`` twice.  On a *banded* sorted layout (edges sorted by
receiver, per-chunk sender/receiver spans bounded — the same contract as
:func:`banded_sorted_spmm_pallas`, satisfied by construction for packed
batches of graphs ≤ ``window/2`` nodes) both gathers become one-hot matmuls
against a windowed ``[window, F]`` VMEM slice, so the only HBM traffic is
two contiguous window DMAs per edge chunk:

    A_rows[e, f] = Σ_w 1[send_e == a_base+w] · a_win[w, f]   (MXU)
    B_rows[e, f] = Σ_w 1[recv_e == b_base+w] · b_win[w, f]   (MXU)
    out[e]       = Σ_f A_rows · B_rows                        (VPU)

Mosaic requires VMEM blocks with sublane dim ≥8, so each grid step owns an
``[8, BE]`` group of edge chunks (metadata, output) and walks its 8
sub-chunks with double-buffered window DMAs.  Out-of-window ids contribute
ZERO silently — validate the layout with ``check_band_contract`` (both
axes) in loaders/tests.

Precision: the per-edge result is a cancelling dot of two gathered value
rows, so ``Precision.DEFAULT`` (bf16 operand truncation) yields ~1e-2 abs
error that is UNBOUNDED in relative terms near zero — unlike the SpMM
kernel, where one-hot selection is exact.  The default here is therefore
``HIGHEST`` (measured 3.7e-5 max rel err on TPU vs 1.3 for DEFAULT);
pass ``precision=jax.lax.Precision.DEFAULT`` to trade accuracy for MXU
throughput when the downstream use is a robust scalar loss.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["banded_sddmm_pallas", "sddmm_banded"]

_GROUP = 8  # chunks per grid step (Mosaic sublane granularity)


def _kernel(a_base_ref, b_base_ref, send_ref, recv_ref, a_hbm, b_hbm,
            out_ref, *, block_edges, window, precision):
    g = pl.program_id(0)

    def body(a_win, b_win, sems):
        def dma(slot, j):
            c = g * _GROUP + j
            return (
                pltpu.make_async_copy(
                    a_hbm.at[pl.ds(a_base_ref[c], window), :],
                    a_win.at[slot], sems.at[slot, 0]),
                pltpu.make_async_copy(
                    b_hbm.at[pl.ds(b_base_ref[c], window), :],
                    b_win.at[slot], sems.at[slot, 1]),
            )

        for d in dma(0, 0):
            d.start()

        sub = jax.lax.broadcasted_iota(jnp.int32, (_GROUP, block_edges), 0)
        acc = jnp.zeros((_GROUP, block_edges), jnp.float32)
        for j in range(_GROUP):
            slot = j % 2
            if j + 1 < _GROUP:
                for d in dma((j + 1) % 2, j + 1):
                    d.start()
            for d in dma(slot, j):
                d.wait()

            c = g * _GROUP + j
            # select sub-chunk row j out of the [8, BE] id blocks
            send = jnp.sum(jnp.where(sub == j, send_ref[:], 0), axis=0,
                           keepdims=True)  # [1, BE]
            recv = jnp.sum(jnp.where(sub == j, recv_ref[:], 0), axis=0,
                           keepdims=True)
            iota_a = a_base_ref[c] + jax.lax.broadcasted_iota(
                jnp.int32, (window, block_edges), 0)
            iota_b = b_base_ref[c] + jax.lax.broadcasted_iota(
                jnp.int32, (window, block_edges), 0)
            # one-hot in the operand dtype (0/1 exact in bf16 too) so the
            # MXU sees matching input dtypes; accumulation stays f32
            oh_a = (send == iota_a).astype(a_win.dtype)  # [window, BE]
            oh_b = (recv == iota_b).astype(b_win.dtype)

            a_rows = jax.lax.dot_general(
                oh_a, a_win[slot], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision)
            b_rows = jax.lax.dot_general(
                oh_b, b_win[slot], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision)
            row = jnp.sum(a_rows * b_rows, axis=-1)  # [BE]
            acc = jnp.where(sub == j, row[None, :], acc)
        out_ref[:] = acc

    # scratch must match the HBM source dtype — a bf16→f32 DMA is an
    # element-type mismatch at the Mosaic level (same rule as segment_spmm)
    pl.run_scoped(
        body,
        a_win=pltpu.VMEM((2, window, a_hbm.shape[-1]), a_hbm.dtype),
        b_win=pltpu.VMEM((2, window, b_hbm.shape[-1]), b_hbm.dtype),
        sems=pltpu.SemaphoreType.DMA((2, 2)),
    )


def banded_sddmm_pallas(a: jax.Array, b: jax.Array, senders: jax.Array,
                        receivers: jax.Array, *, window: int = 512,
                        block_edges: int = 512,
                        precision=jax.lax.Precision.HIGHEST,
                        interpret: bool = False) -> jax.Array:
    """``out[e] = ⟨a[senders[e]], b[receivers[e]]⟩`` for banded edge lists.

    ``a [Na, F]``, ``b [Nb, F]``; edges whose sender/receiver falls outside
    its chunk's ``[base, base+window)`` window yield 0.  Padding edges should
    carry an out-of-range id (e.g. ``Na``) so they self-mask.  ``F`` must be
    a multiple of 128 (lane tile); pad features upstream otherwise.
    """
    E, = senders.shape
    (Na, F), (Nb, Fb) = a.shape, b.shape
    assert F == Fb and F % 128 == 0, (F, Fb)
    assert block_edges % 128 == 0 and window % 8 == 0

    n_chunks = max((E + block_edges - 1) // block_edges, 1)
    n_chunks = ((n_chunks + _GROUP - 1) // _GROUP) * _GROUP
    E_pad = n_chunks * block_edges

    def pad_ids(ids, n):
        ids = jnp.concatenate(
            [ids.astype(jnp.int32), jnp.full(E_pad - E, n, jnp.int32)])
        return ids.reshape(n_chunks, block_edges)

    send2d = pad_ids(senders, Na)
    recv2d = pad_ids(receivers, Nb)

    # pad the node axes so a clipped window always fits
    def pad_rows(m, n):
        np_ = max(n, window)
        if np_ != n:
            m = jnp.concatenate([m, jnp.zeros((np_ - n, F), m.dtype)])
        return m, np_

    a, Na_p = pad_rows(a, Na)
    b, Nb_p = pad_rows(b, Nb)

    # per-chunk window bases (trace-time min over valid ids)
    def bases(ids2d, n, n_pad):
        key = jnp.where(ids2d < n, ids2d, n_pad)
        mn = jnp.min(key, axis=1)
        return jnp.clip((mn // 8) * 8, 0, max(n_pad - window, 0))

    a_base = bases(send2d, Na, Na_p)
    b_base = bases(recv2d, Nb, Nb_p)

    out = pl.pallas_call(
        functools.partial(_kernel, block_edges=block_edges, window=window,
                          precision=precision),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_chunks // _GROUP,),
            in_specs=[
                pl.BlockSpec((_GROUP, block_edges), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),  # send2d
                pl.BlockSpec((_GROUP, block_edges), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),  # recv2d
                pl.BlockSpec(memory_space=pl.ANY),      # a
                pl.BlockSpec(memory_space=pl.ANY),      # b
            ],
            out_specs=pl.BlockSpec((_GROUP, block_edges),
                                   lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((n_chunks, block_edges), jnp.float32),
        interpret=interpret,
    )(a_base, b_base, send2d, recv2d, a, b)
    return out.reshape(-1)[:E]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _sddmm_vjp(a, b, senders, receivers, window, interpret):
    return banded_sddmm_pallas(a, b, senders, receivers, window=window,
                               interpret=interpret)


def _sddmm_fwd(a, b, senders, receivers, window, interpret):
    return (_sddmm_vjp(a, b, senders, receivers, window, interpret),
            (a, b, senders, receivers))


def _sddmm_bwd(window, interpret, res, g):
    a, b, s, r = res
    # d_a[i] = Σ_{e: send_e == i} g_e · b[recv_e]; symmetric for d_b.
    # XLA scatters — SDDMM backward is a cold path (losses run once/step).
    s_safe = jnp.clip(s, 0, a.shape[0] - 1)
    r_safe = jnp.clip(r, 0, b.shape[0] - 1)
    valid = ((s >= 0) & (s < a.shape[0]) &
             (r >= 0) & (r < b.shape[0])).astype(g.dtype)
    gv = (g * valid)[:, None]
    d_a = jax.ops.segment_sum(gv * b[r_safe], s_safe,
                              num_segments=a.shape[0])
    d_b = jax.ops.segment_sum(gv * a[s_safe], r_safe,
                              num_segments=b.shape[0])
    return d_a.astype(a.dtype), d_b.astype(b.dtype), None, None


_sddmm_vjp.defvjp(_sddmm_fwd, _sddmm_bwd)


def sddmm_banded(a, b, senders, receivers, *, window: int = 512,
                 interpret: bool = False):
    """Differentiable banded SDDMM (forward = Pallas fused kernel, backward
    = XLA transposed scatters)."""
    return _sddmm_vjp(a, b, senders, receivers, window, interpret)
