"""Lift operators: un-pooling ``X̃ = f(S_inv, X')``
(reference: tgp/lift/base_lift.py:17-254).

``matrix_op`` semantics (reference ``_get_lift_matrix``, base_lift.py:86-100):
  * ``'transpose'`` (default): ``S_inv = Sᵀ`` → sparse path is a pure gather
    ``x̃_i = w_i · x'_{cluster(i)}``; dense path is ``S · X'``.
  * ``'inverse'``: Moore–Penrose pseudo-inverse, computed lazily per graph
    (dense layouts only — ``jnp.linalg.pinv`` under ``vmap``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from tgp_tpu.select.base import SelectOutput

__all__ = ["lift_sparse", "lift_dense_batched", "lift_dense_unbatched", "base_lift"]


def lift_sparse(x_pool: jax.Array, so: SelectOutput) -> jax.Array:
    """Sparse path: gather pooled features back through the assignment
    (reference: base_lift.py:102-111).  ``x_pool`` is ``[C, F]``."""
    out = x_pool[so.cluster_index] * so.weight[:, None]
    return jnp.where(so.node_sel_mask[:, None], out, 0.0)


def _pinv_s(s: jax.Array) -> jax.Array:
    """Per-graph pseudo-inverse of dense ``[..., N, K]`` assignments,
    transposed so it can be used in place of ``S`` (reference
    ``pseudo_inverse``, tgp/utils/ops.py:942-972)."""
    return jnp.swapaxes(jnp.linalg.pinv(s), -1, -2)


def lift_dense_batched(x_pool: jax.Array, so: SelectOutput) -> jax.Array:
    """Dense batched: ``X̃ = S · X'`` (``[B,N,K] × [B,K,F]``)."""
    s = so.s
    if so.s_inv_op == "inverse":
        s = _pinv_s(s)
    out = jnp.einsum("bnk,bkf->bnf", s, x_pool)
    if so.in_mask is not None:
        out = jnp.where(so.in_mask[..., None], out, 0.0)
    return out


def lift_dense_unbatched(x_pool: jax.Array, so: SelectOutput) -> jax.Array:
    """Dense unbatched ``[N,K]`` over multi-graph pooled ``[B,K,F]`` (or
    ``[B·K,F]``): gather each node's graph block then contract
    (reference case 3, base_lift.py:178-247)."""
    K = so.s.shape[-1]
    if x_pool.ndim == 2:
        x_pool = x_pool.reshape(so.num_graphs, K, -1)
    s = so.s
    per_node_block = x_pool[so.node_graph]  # [N, K, F]
    out = jnp.einsum("nk,nkf->nf", s, per_node_block)
    if so.node_mask is not None:
        out = jnp.where(so.node_mask[:, None], out, 0.0)
    return out


def base_lift(x_pool: jax.Array, so: SelectOutput) -> jax.Array:
    """Dispatching lift (the reference's ``BaseLift.forward``)."""
    if so.is_sparse:
        return lift_sparse(x_pool, so)
    if so.s.ndim == 3:
        return lift_dense_batched(x_pool, so)
    return lift_dense_unbatched(x_pool, so)
