"""Reduce operators: ``X' = SᵀX`` with the reference's 4 dispatch paths
(tgp/reduce/base_reduce.py:88-193), re-expressed as static-shape TPU ops.

Path map (reference → here):
  1. sparse S → gather + weight + scatter-sum       → :func:`reduce_sparse`
  2. dense ``[B,N,K]`` → batched matmul (MXU)       → :func:`reduce_dense_batched`
  3. dense ``[N,K]`` multi-graph → per-graph loop   → :func:`reduce_dense_unbatched`
     (the reference's Python ``unbatch``+matmul loop becomes one segment-sum
     of per-node outer products — no host control flow)
  4. dense ``[N,K]`` single graph → matmul          → special case of 3
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from tgp_tpu.ops.segment import segment_sum
from tgp_tpu.select.base import SelectOutput

__all__ = [
    "reduce_sparse",
    "reduce_dense_batched",
    "reduce_dense_unbatched",
    "base_reduce",
]


def reduce_sparse(x: jax.Array, so: SelectOutput) -> jax.Array:
    """Path 1: ``x_pool[c] = Σ_{i: cluster(i)=c} w_i · x_i`` (``[C, F]``)."""
    src = x * so.weight[:, None]
    src = jnp.where(so.node_sel_mask[:, None], src, 0.0)
    return jax.ops.segment_sum(src, so.cluster_index,
                               num_segments=so.num_clusters)


def reduce_dense_batched(x: jax.Array, s: jax.Array) -> jax.Array:
    """Path 2: ``[B,N,K]ᵀ × [B,N,F] → [B,K,F]`` on the MXU."""
    return jnp.einsum("bnk,bnf->bkf", s, x)


def reduce_dense_unbatched(
    x: jax.Array,
    s: jax.Array,
    node_graph: jax.Array,
    num_graphs: int,
    node_mask: Optional[jax.Array] = None,
    return_batched: bool = True,
) -> jax.Array:
    """Paths 3/4: flat ``[N,K]`` assignments over a multi-graph batch.

    ``x_pool[g,k] = Σ_{i∈g} s[i,k] x[i]`` via segment-sum of per-node
    ``K×F`` outer products; returns ``[B,K,F]`` (or ``[B·K,F]`` flattened
    when ``return_batched=False``, matching the reference's concat layout).
    """
    outer = jnp.einsum("nk,nf->nkf", s, x)
    pooled = segment_sum(outer, node_graph, num_graphs, mask=node_mask)
    if return_batched:
        return pooled
    return pooled.reshape(-1, x.shape[-1])


def base_reduce(x: jax.Array, so: SelectOutput, *, return_batched: bool = True):
    """Dispatching reduce (the reference's ``BaseReduce.forward``)."""
    if so.is_sparse:
        return reduce_sparse(x, so)
    if so.s.ndim == 3:
        return reduce_dense_batched(x, so.s)
    return reduce_dense_unbatched(
        x, so.s, so.node_graph, so.num_graphs, so.node_mask,
        return_batched=return_batched,
    )
