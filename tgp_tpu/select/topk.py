"""Top-k selection (reference: ``TopkSelect``, tgp/select/topk_select.py:14-216).

TPU design: instead of PyG's dynamic per-graph ``topk`` (sorting and
*compacting* to a shorter node list), scores are ranked **within each graph**
by :func:`~tgp_tpu.ops.segment.segment_topk_rank` and a node is selected iff
``rank < ceil(ratio · n_g)``.  Selected node *i* becomes supernode
``g_i · Kmax + rank_i`` in a graph-major static id space of
``B · Kmax`` slots (``Kmax = ceil(ratio · max_nodes)``), with validity masks
instead of compaction.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from tgp_tpu.graph import GraphBatch
from tgp_tpu.ops.segment import segment_softmax, segment_topk_rank
from tgp_tpu.select.base import SelectOutput
from tgp_tpu.utils.activations import resolve_activation


def topk_budget(ratio: Union[int, float], max_nodes: int) -> int:
    """Static per-graph supernode budget ``Kmax``."""
    if isinstance(ratio, int) and ratio >= 1:
        return min(ratio, max_nodes)
    return max(int(math.ceil(ratio * max_nodes)), 1)


def topk_select_from_scores(
    score: jax.Array,
    batch: GraphBatch,
    ratio: Union[int, float],
    min_score: Optional[float] = None,
    s_inv_op: str = "transpose",
    extras: Optional[dict] = None,
) -> SelectOutput:
    """Shared selection core: per-graph ranking of a precomputed score.

    Used by Topk/SAG/ASAP/PAN/MaxCut poolers (they differ only in how the
    score is produced; cf. reference topk_select.py:169-207 and PyG ``topk``).
    """
    B = batch.num_graphs
    kmax = batch.max_nodes if min_score is not None else topk_budget(
        ratio, batch.max_nodes
    )
    rank = segment_topk_rank(score, batch.node_graph, B, mask=batch.node_mask)

    if min_score is not None:
        # PyG ``topk`` semantics: threshold at min(max_g − tol, min_score) so
        # at least the top-scoring node of each graph survives
        # (reference: torch_geometric.nn.pool.select.topk, used by
        # tgp/select/topk_select.py:169-207).
        from tgp_tpu.ops.segment import segment_max

        smax = segment_max(score, batch.node_graph, B, mask=batch.node_mask)
        thr = jnp.minimum(smax - 1e-7, min_score)
        keep = batch.node_mask & (score > thr[batch.node_graph])
        # rank among *kept* nodes gives a compact per-graph slot
        rank = segment_topk_rank(score, batch.node_graph, B, mask=keep)
    else:
        n_g = batch.nodes_per_graph()
        if isinstance(ratio, int) and ratio >= 1:
            k_g = jnp.minimum(n_g, ratio)
        else:
            k_g = jnp.ceil(ratio * n_g).astype(jnp.int32)
            k_g = jnp.maximum(k_g, 1)
        keep = batch.node_mask & (rank < k_g[batch.node_graph])

    num_clusters = B * kmax
    rank_c = jnp.minimum(rank, kmax - 1)
    cluster_index = jnp.where(keep, batch.node_graph * kmax + rank_c, 0)

    cluster_graph = (
        jnp.arange(num_clusters, dtype=jnp.int32) // kmax
    )
    cluster_pos = (jnp.arange(num_clusters, dtype=jnp.int32) % kmax)

    return SelectOutput(
        cluster_index=cluster_index.astype(jnp.int32),
        weight=jnp.where(keep, score, 0.0),
        node_sel_mask=keep,
        node_graph=batch.node_graph,
        node_mask=batch.node_mask,
        cluster_graph=cluster_graph,
        cluster_pos=cluster_pos,
        num_clusters=num_clusters,
        num_graphs=B,
        max_clusters=kmax,
        partial=True,
        s_inv_op=s_inv_op,
        extras=extras or {},
    )


class TopkSelect(nn.Module):
    """Learnable-projection top-k selector.

    ``y = act(X·p/‖p‖)`` (or per-graph softmax when ``min_score`` is set),
    then per-graph top-``ratio`` selection (reference:
    tgp/select/topk_select.py:169-207).
    """

    in_channels: Optional[int] = None
    ratio: Union[int, float] = 0.5
    min_score: Optional[float] = None
    act: Union[str, Callable, None] = "tanh"
    s_inv_op: str = "transpose"

    @nn.compact
    def __call__(self, batch: GraphBatch) -> SelectOutput:
        x = batch.x
        if self.in_channels is None or self.in_channels <= 1:
            score = x[:, 0] if x.ndim > 1 else x
        else:
            bound = 1.0 / math.sqrt(self.in_channels)
            # uniform(-bound, bound), matching PyG's ``uniform`` init
            w = self.param(
                "weight",
                lambda key, shape: jax.random.uniform(
                    key, shape, minval=-bound, maxval=bound
                ),
                (self.in_channels,),
            )
            score = x @ w
            if self.min_score is None:
                score = score / jnp.maximum(jnp.linalg.norm(w), 1e-12)

        if self.min_score is None:
            score = resolve_activation(self.act)(score)
        else:
            score = segment_softmax(
                score, batch.node_graph, batch.num_graphs, mask=batch.node_mask
            )

        return topk_select_from_scores(
            score, batch, self.ratio, self.min_score, self.s_inv_op
        )
