"""Lift operators: un-pooling ``X̃ = f(S_inv, X')``
(reference: tgp/lift/base_lift.py:17-254).

``matrix_op`` semantics (reference ``_get_lift_matrix``, base_lift.py:86-100):
  * ``'precomputed'`` (reference default): use the select operator's own
    ``s_inv`` — i.e. honor ``so.s_inv_op`` (``'transpose'`` or ``'inverse'``,
    cf. ``set_s_inv``, base_select.py:290-300).
  * ``'transpose'``: force ``S_inv = Sᵀ`` regardless of the select's choice →
    sparse path is a pure gather ``x̃_i = w_i · x'_{cluster(i)}``; dense path
    is ``S · X'``.
  * ``'inverse'``: force the Moore–Penrose pseudo-inverse.  Dense layouts use
    ``jnp.linalg.pinv``; single-membership sparse layouts use the closed form
    ``S⁺[c, i] = w_i / Σ_{j∈c} w_j²`` (each S row has one nonzero, so
    ``SᵀS`` is diagonal) — no dense materialization needed.

``reduce_op`` semantics (reference ``_lift_sparse``, base_lift.py:102-111):
how multiple S-entries lifting into the same node combine — ``'sum'``,
``'mean'`` (divides by the count of *structural nonzeros* in the node's
S_inv row, like torch scatter-mean over sparse entries), or ``'max'``
(entrywise max over the node's contributions).  Single-membership sparse
assignments have exactly one entry per node, so all three coincide there.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from tgp_tpu.select.base import SelectOutput

__all__ = ["lift_sparse", "lift_dense_batched", "lift_dense_unbatched",
           "base_lift"]


def _resolve_op(so: SelectOutput, matrix_op: str) -> str:
    if matrix_op == "precomputed":
        return so.s_inv_op  # what the select stored (base_lift.py:88-92)
    if matrix_op in ("transpose", "inverse"):
        return matrix_op
    raise ValueError(f"matrix_op must be precomputed|transpose|inverse, "
                     f"got {matrix_op!r}")


def lift_sparse(x_pool: jax.Array, so: SelectOutput,
                matrix_op: str = "precomputed",
                reduce_op: str = "sum") -> jax.Array:
    """Sparse path: gather pooled features back through the assignment
    (reference: base_lift.py:102-111).  ``x_pool`` is ``[C, F]``."""
    op = _resolve_op(so, matrix_op)
    w = so.weight
    if op == "inverse":
        # closed-form pinv for one-nonzero-per-row S: w_i / Σ_{j∈c} w_j²
        denom = jax.ops.segment_sum(
            jnp.where(so.node_sel_mask, w * w, 0.0), so.cluster_index,
            num_segments=so.num_clusters)
        w = w / jnp.maximum(denom[so.cluster_index], 1e-12)
    # reduce_op: exactly one entry per node → sum == mean == max
    out = x_pool[so.cluster_index] * w[:, None]
    return jnp.where(so.node_sel_mask[:, None], out, 0.0)


def _pinv_s(s: jax.Array) -> jax.Array:
    """Per-graph pseudo-inverse of dense ``[..., N, K]`` assignments,
    transposed so it can be used in place of ``S`` (reference
    ``pseudo_inverse``, tgp/utils/ops.py:942-972)."""
    return jnp.swapaxes(jnp.linalg.pinv(s), -1, -2)


def _combine(s: jax.Array, x_block: jax.Array, reduce_op: str) -> jax.Array:
    """Combine per-node contributions ``s[..., n, k]·x_block[..., k, f]``
    over k with the given reduction (structural nonzeros of s only)."""
    if reduce_op == "sum":
        return jnp.einsum("...nk,...kf->...nf", s, x_block)
    nz = (s != 0)
    if reduce_op == "mean":
        summed = jnp.einsum("...nk,...kf->...nf", s, x_block)
        cnt = jnp.maximum(nz.sum(-1), 1)
        return summed / cnt[..., None].astype(summed.dtype)
    if reduce_op == "max":
        contrib = s[..., :, :, None] * x_block[..., None, :, :]  # [...,n,k,f]
        contrib = jnp.where(nz[..., :, :, None], contrib, -jnp.inf)
        out = jnp.max(contrib, axis=-2)
        return jnp.where(jnp.isfinite(out), out, 0.0)
    raise ValueError(f"reduce_op must be sum|mean|max, got {reduce_op!r}")


def lift_dense_batched(x_pool: jax.Array, so: SelectOutput,
                       matrix_op: str = "precomputed",
                       reduce_op: str = "sum") -> jax.Array:
    """Dense batched: ``X̃ = S_inv ᵀ-substituted · X'``
    (``[B,N,K] × [B,K,F]``)."""
    op = _resolve_op(so, matrix_op)
    s = _pinv_s(so.s) if op == "inverse" else so.s
    out = _combine(s, x_pool, reduce_op)
    if so.in_mask is not None:
        out = jnp.where(so.in_mask[..., None], out, 0.0)
    return out


def lift_dense_unbatched(x_pool: jax.Array, so: SelectOutput,
                         matrix_op: str = "precomputed",
                         reduce_op: str = "sum") -> jax.Array:
    """Dense unbatched ``[N,K]`` over multi-graph pooled ``[B,K,F]`` (or
    ``[B·K,F]``): gather each node's graph block then contract
    (reference case 3, base_lift.py:178-247)."""
    op = _resolve_op(so, matrix_op)
    K = so.s.shape[-1]
    if x_pool.ndim == 2:
        x_pool = x_pool.reshape(so.num_graphs, K, -1)
    s = so.s
    if op == "inverse":
        # per-graph pinv of the graph's S block: build [B, Nmax?, K] is not
        # available here — use the normal equations on the flat layout:
        # S⁺ᵀ = S (SᵀS)⁻¹ per graph (S has full column rank on soft
        # assignments; pinv(S)ᵀ = S(SᵀS)⁻¹ when rank K)
        outer = jnp.einsum("nk,nj->nkj", s, s)
        if so.node_mask is not None:
            outer = jnp.where(so.node_mask[:, None, None], outer, 0.0)
        sts = jax.ops.segment_sum(outer, so.node_graph,
                                  num_segments=so.num_graphs)  # [B,K,K]
        eye = jnp.eye(K, dtype=s.dtype)
        inv = jnp.linalg.pinv(sts + 1e-9 * eye)
        s = jnp.einsum("nk,nkj->nj", s, inv[so.node_graph])
    per_node_block = x_pool[so.node_graph]  # [N, K, F]
    # per-node contraction [K] × [K, F] with reduce-op semantics:
    if reduce_op == "sum":
        out = jnp.einsum("nk,nkf->nf", s, per_node_block)
    elif reduce_op == "mean":
        summed = jnp.einsum("nk,nkf->nf", s, per_node_block)
        cnt = jnp.maximum((s != 0).sum(-1), 1)
        out = summed / cnt[:, None].astype(summed.dtype)
    elif reduce_op == "max":
        contrib = s[:, :, None] * per_node_block
        contrib = jnp.where((s != 0)[:, :, None], contrib, -jnp.inf)
        out = jnp.max(contrib, axis=1)
        out = jnp.where(jnp.isfinite(out), out, 0.0)
    else:
        raise ValueError(f"reduce_op must be sum|mean|max, got {reduce_op!r}")
    if so.node_mask is not None:
        out = jnp.where(so.node_mask[:, None], out, 0.0)
    return out


def base_lift(x_pool: jax.Array, so: SelectOutput,
              matrix_op: str = "precomputed",
              reduce_op: str = "sum") -> jax.Array:
    """Dispatching lift (the reference's ``BaseLift.forward``)."""
    if so.is_sparse:
        return lift_sparse(x_pool, so, matrix_op, reduce_op)
    if so.s.ndim == 3:
        return lift_dense_batched(x_pool, so, matrix_op, reduce_op)
    return lift_dense_unbatched(x_pool, so, matrix_op, reduce_op)
