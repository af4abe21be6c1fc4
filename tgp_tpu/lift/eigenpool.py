"""EigenPool lift: inverse mode-major reshape then ``X̃ = Θ·X'``
(reference: tgp/lift/eigenpool_lift.py:13-149)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tgp_tpu.select.base import SelectOutput

__all__ = ["eigenpool_lift"]


def eigenpool_lift(x_pool: jax.Array, so: SelectOutput) -> jax.Array:
    """``x_pool [B, K, H·F]`` → ``x̃ [N, F]`` over the flat node space."""
    theta = so.s  # [N, H*K]
    H = so.num_modes or int(so.extras["num_modes"])
    B, K, HF = x_pool.shape
    F = HF // H
    raw = x_pool.reshape(B, K, H, F).transpose(0, 2, 1, 3).reshape(B, H * K, F)
    per_node = raw[so.node_graph]  # [N, H*K, F]
    out = jnp.einsum("nc,ncf->nf", theta, per_node)
    return jnp.where(so.node_mask[:, None], out, 0.0)
