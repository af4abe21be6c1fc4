"""EigenPool reduce: ``X' = ΘᵀX`` reshaped mode-major ``[H·K, F] → [K, H·F]``
(reference: tgp/reduce/eigenpool_reduce.py:13-146)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tgp_tpu.ops.segment import segment_sum
from tgp_tpu.select.base import SelectOutput

__all__ = ["eigenpool_reduce"]


def eigenpool_reduce(x: jax.Array, so: SelectOutput) -> jax.Array:
    """``x [N, F]`` (flat over the batch) → ``[B, K, H·F]``."""
    theta = so.s  # [N, H*K]
    H = so.num_modes or int(so.extras["num_modes"])
    K = so.num_clusters
    raw = jnp.einsum("nc,nf->ncf", theta, x)
    raw = segment_sum(raw, so.node_graph, so.num_graphs, mask=so.node_mask)
    B, HK, F = raw.shape
    return raw.reshape(B, H, K, F).transpose(0, 2, 1, 3).reshape(B, K, H * F)
