"""Connect operators: pooled adjacency ``A' `` from the original connectivity.

Sparse world (reference: ``sparse_connect``, tgp/connect/base_conn.py:57-112):
two regimes —
  (a) **partial selection** (top-k style): ``A' = A[kept, kept]`` — edges whose
      endpoints are both selected, relabeled to supernode ids.  Static-shape
      version: masking instead of ``subgraph`` compaction.
  (b) **total assignment** (graclus/kmis/maxcut): relabel both endpoints via
      ``cluster_index`` and merge duplicates (``coalesce``) under the static
      edge budget.

Dense world (reference: ``DenseConnect``, tgp/connect/dense_conn.py:22-364):
``A' = SᵀAS`` — two batched matmuls on the MXU; unbatched twin uses SpMM for
``Z = AS`` then a segment contraction for ``SᵀZ``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from tgp_tpu.ops.segment import segment_sum
from tgp_tpu.ops.sparse import coalesce, postprocess_adj_sparse, spmm
from tgp_tpu.select.base import SelectOutput

__all__ = ["sparse_connect", "dense_connect", "dense_connect_unbatched",
           "ConnectConfig"]


from dataclasses import dataclass


@dataclass(frozen=True)
class ConnectConfig:
    """Post-processing flags shared by all connectors (reference: connect
    constructor args ``remove_self_loops/degree_norm/edge_weight_norm``,
    tgp/connect/base_conn.py:115-160)."""

    reduce_op: str = "sum"
    remove_self_loops: bool = True
    degree_norm: bool = False
    edge_weight_norm: bool = False
    prune_eps: Optional[float] = None


def sparse_connect(
    senders: jax.Array,
    receivers: jax.Array,
    edge_weight: jax.Array,
    edge_mask: jax.Array,
    so: SelectOutput,
    cfg: ConnectConfig = ConnectConfig(),
):
    """Pooled sparse connectivity.  Returns ``(senders', receivers',
    edge_weight', edge_mask')`` over the ``[0, num_clusters)`` id space with
    the same static edge budget."""
    from tgp_tpu.ops.sparse import check_and_filter_edge_weights

    edge_weight = check_and_filter_edge_weights(edge_weight)
    sel = so.node_sel_mask
    new_s = so.cluster_index[senders]
    new_r = so.cluster_index[receivers]
    valid = edge_mask & sel[senders] & sel[receivers]
    w = jnp.where(valid, edge_weight, 0.0)
    new_s = jnp.where(valid, new_s, 0)
    new_r = jnp.where(valid, new_r, 0)

    if not so.partial:
        # total assignment → duplicate edges must be merged
        new_s, new_r, w, valid = coalesce(
            new_s, new_r, w, valid, so.num_clusters, reduce=cfg.reduce_op
        )

    new_s, new_r, w, valid = postprocess_adj_sparse(
        new_s, new_r, w, valid,
        so.cluster_graph, so.num_clusters, so.num_graphs,
        remove_self_loops_flag=cfg.remove_self_loops,
        degree_norm=cfg.degree_norm,
        edge_weight_norm=cfg.edge_weight_norm,
        prune_eps=cfg.prune_eps,
    )
    return new_s, new_r, w, valid


def dense_connect(adj: jax.Array, s: jax.Array) -> jax.Array:
    """``A' = SᵀAS`` for batched dense ``[B,N,N] × [B,N,K]`` (two MXU
    matmuls; reference ``_dense_connect``, tgp/connect/dense_conn.py:112-122)."""
    return jnp.einsum("bnk,bnm,bmj->bkj", s, adj, s)


def dense_connect_unbatched(
    senders: jax.Array,
    receivers: jax.Array,
    edge_weight: jax.Array,
    s: jax.Array,
    node_graph: jax.Array,
    num_graphs: int,
    node_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Unbatched twin: per-graph ``S_gᵀ A_g S_g`` without densifying A.

    ``Z = AS`` via SpMM over the flat COO, then ``A'[g] = Σ_{i∈g} S_i ⊗ Z_i``
    via segment-sum (replacing the reference's per-graph Python loop,
    tgp/connect/dense_conn.py:140-208).  Returns ``[B,K,K]``.
    """
    N = s.shape[0]
    z = spmm(receivers, senders, edge_weight, s, N)  # (A S)_i
    outer = jnp.einsum("nk,nj->nkj", s, z)
    return segment_sum(outer, node_graph, num_graphs, mask=node_mask)
