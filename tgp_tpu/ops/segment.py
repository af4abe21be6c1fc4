"""Segment (scatter-reduce) primitives — the load-bearing sparse kernels.

These replace the reference stack's ``torch_scatter`` C++/CUDA segment
reductions (reference dependency, pyproject.toml:40-45; used throughout
tgp/reduce/base_reduce.py:141-155, tgp/lift/base_lift.py:102-111, and the
sparse losses in tgp/utils/losses.py).  On TPU, XLA lowers
``jax.ops.segment_*`` to scatter/reduce-window combos; the hot SpMM-shaped
cases additionally have Pallas kernels in :mod:`tgp_tpu.ops.pallas`.

All functions take a static ``num_segments`` and never branch on data, so
they are jit/vmap/shard_map safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "segment_sum",
    "segment_mean",
    "segment_max",
    "segment_min",
    "segment_softmax",
    "segment_count",
    "segment_normalize",
    "segment_topk_rank",
]



def segment_sum(data, segment_ids, num_segments, mask=None, *,
                indices_are_sorted: bool = False):
    """Masked scatter-add: ``out[s] = Σ_{i: seg[i]==s, mask[i]} data[i]``.

    ``indices_are_sorted=True`` (caller guarantees ascending ``segment_ids``)
    lets XLA skip the serialized random-scatter path — measured ~5-7× faster
    on TPU for 1-d updates (scripts/exp_sorted_segment.py)."""
    if mask is not None:
        shape = data.shape if data.ndim == mask.ndim else mask.shape + (1,) * (data.ndim - mask.ndim)
        data = jnp.where(mask.reshape(shape), data, 0)
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments,
                               indices_are_sorted=indices_are_sorted)


def segment_count(segment_ids, num_segments, mask=None):
    """Element count per segment.

    Fast path: XLA serializes the ``[N]→[B]`` integer scatter on TPU
    (7.2 ms at N=65k, B=1 — round-5 trace), so for small ``B·N`` the count
    is a one-hot ``[B,N]·[N]`` matvec instead (exact: counts < 2²⁴ in
    f32).  Falls back to the scatter for segment/element counts where the
    one-hot FLOPs would exceed the scatter cost."""
    n = segment_ids.shape[0]
    if n * num_segments <= (1 << 28) and n < (1 << 24):
        oh = (segment_ids[None, :]
              == jnp.arange(num_segments, dtype=segment_ids.dtype)[:, None])
        v = (jnp.ones(n, jnp.float32) if mask is None
             else mask.astype(jnp.float32))
        cnt = jnp.einsum("bn,n->b", oh.astype(jnp.float32), v,
                         precision=jax.lax.Precision.HIGHEST)
        return cnt.astype(jnp.int32)
    ones = jnp.ones(segment_ids.shape, jnp.int32)
    return segment_sum(ones, segment_ids, num_segments, mask=mask)


def segment_mean(data, segment_ids, num_segments, mask=None, eps: float = 1e-12):
    s = segment_sum(data, segment_ids, num_segments, mask=mask)
    c = segment_count(segment_ids, num_segments, mask=mask).astype(s.dtype)
    c = jnp.maximum(c, eps)
    if s.ndim > c.ndim:
        c = c.reshape(c.shape + (1,) * (s.ndim - c.ndim))
    return s / c


def segment_max(data, segment_ids, num_segments, mask=None, *,
                indices_are_sorted: bool = False):
    """Masked segment max; empty float segments return ``-inf`` (so
    ``isfinite`` guards catch them — a finite dtype-min fill silently
    overflows downstream dense layers), empty int segments dtype-min."""
    if mask is not None:
        shape = data.shape if data.ndim == mask.ndim else mask.shape + (1,) * (data.ndim - mask.ndim)
        fill = (-jnp.inf if jnp.issubdtype(data.dtype, jnp.floating)
                else jnp.iinfo(data.dtype).min)
        data = jnp.where(mask.reshape(shape), data, fill)
    return jax.ops.segment_max(data, segment_ids, num_segments=num_segments,
                               indices_are_sorted=indices_are_sorted)


def segment_min(data, segment_ids, num_segments, mask=None, *,
                indices_are_sorted: bool = False):
    """Masked segment min; empty float segments return ``+inf``, empty int
    segments dtype-max."""
    if mask is not None:
        shape = data.shape if data.ndim == mask.ndim else mask.shape + (1,) * (data.ndim - mask.ndim)
        fill = (jnp.inf if jnp.issubdtype(data.dtype, jnp.floating)
                else jnp.iinfo(data.dtype).max)
        data = jnp.where(mask.reshape(shape), data, fill)
    return jax.ops.segment_min(data, segment_ids, num_segments=num_segments,
                               indices_are_sorted=indices_are_sorted)


def segment_softmax(scores, segment_ids, num_segments, mask=None):
    """Numerically-stable per-segment softmax (per-graph softmax / sparse
    attention normalizer; reference analogues: per-graph ``softmax`` in
    tgp/select/topk_select.py ``min_score`` path and LaPool's sparse cosine
    softmax, tgp/select/lapool_select.py:26-78).

    Masked-out entries get probability 0 and do not contribute to the
    normalizer.
    """
    m = segment_max(scores, segment_ids, num_segments, mask=mask)
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    shifted = scores - m[segment_ids]
    e = jnp.exp(shifted)
    if mask is not None:
        bm = (mask if mask.ndim == e.ndim
              else mask.reshape(mask.shape + (1,) * (e.ndim - mask.ndim)))
        e = jnp.where(bm, e, 0.0)
    denom = segment_sum(e, segment_ids, num_segments)
    denom = jnp.maximum(denom, 1e-16)
    return e / denom[segment_ids]


def segment_normalize(data, segment_ids, num_segments, mask=None, ord: str = "max_abs",
                      eps: float = 1e-12):
    """Per-segment normalization. ``ord='max_abs'`` divides by the per-segment
    max |value| (reference: per-graph max-abs edge-weight norm in
    ``postprocess_adj_pool_sparse``, tgp/utils/ops.py:338-419); ``'sum'``
    divides by the per-segment sum."""
    if ord == "max_abs":
        denom = segment_max(jnp.abs(data), segment_ids, num_segments, mask=mask)
    elif ord == "sum":
        denom = segment_sum(data, segment_ids, num_segments, mask=mask)
    else:
        raise ValueError(f"unknown ord {ord!r}")
    denom = jnp.where(jnp.abs(denom) > eps, denom, 1.0)
    out = data / denom[segment_ids]
    if mask is not None:
        bm = (mask if mask.ndim == out.ndim
              else mask.reshape(mask.shape + (1,) * (out.ndim - mask.ndim)))
        out = jnp.where(bm, out, data)
    return out


def segment_topk_rank(scores, segment_ids, num_segments, mask=None):
    """Rank of each element within its segment by **descending** score.

    Returns ``rank [N] int32`` where rank 0 is the largest valid score in the
    segment; masked elements rank after all valid ones.  Ties break by
    original index (stable).  This is the static-shape engine behind
    per-graph top-k selection (reference: PyG ``topk`` used in
    tgp/select/topk_select.py:169-207).
    """
    n = scores.shape[0]
    if mask is None:
        mask = jnp.ones(n, bool)
    # Lexicographic sort: segment asc, valid-first, score desc, index asc.
    order = jnp.lexsort(
        (jnp.arange(n), -scores, ~mask, segment_ids)
    )
    pos = jnp.zeros(n, jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
    # start[g] = number of elements (valid or not) with segment < g.
    total_per_seg = segment_count(segment_ids, num_segments)
    start = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(total_per_seg)[:-1].astype(jnp.int32)]
    )
    return pos - start[segment_ids]
