"""PANPooling (reference: tgp/poolers/pan.py:18-211; Ma et al., NeurIPS
2020).  Score = ``β₀·(X·p) + β₁·deg(M)`` from PANConv's MET matrix, then
top-k + subgraph connect over the MET support."""

from __future__ import annotations

from typing import Callable, Optional, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from tgp_tpu.connect.base import ConnectConfig, sparse_connect
from tgp_tpu.graph import GraphBatch
from tgp_tpu.poolers import register_pooler
from tgp_tpu.select.base import SelectOutput
from tgp_tpu.select.topk import topk_select_from_scores
from tgp_tpu.src import PoolingOutput, SRCPooling
from tgp_tpu.utils.activations import resolve_activation

__all__ = ["PANPooling"]


@register_pooler("pan")
class PANPooling(SRCPooling):
    in_channels: int = 0
    ratio: Union[int, float] = 0.5
    min_score: Optional[float] = None
    multiplier: float = 1.0
    nonlinearity: Union[str, Callable, None] = "tanh"
    s_inv_op: str = "transpose"
    connect_red_op: str = "sum"
    remove_self_loops: bool = False
    degree_norm: bool = False
    edge_weight_norm: bool = False

    IS_TRAINABLE = True

    @nn.compact
    def __call__(self, batch: GraphBatch, *, so: Optional[SelectOutput] = None,
                 lifting: bool = False, x: Optional[jax.Array] = None,
                 met_degree: Optional[jax.Array] = None,
                 met_dense: Optional[jax.Array] = None):
        """``batch`` should carry the MET matrix as its connectivity (i.e. the
        pooled-support ``met_edge_weight`` from :class:`~tgp_tpu.mp.pan.PANConv`
        written into ``edge_weight``); ``met_degree`` overrides the degree
        term when the exact ``M·1`` is available.  When ``met_dense``
        (``[B, Nmax, Nmax]`` from ``PANConv(return_dense_met=True)``) is
        given, the connect step pools the FULL MET matrix exactly — the
        reference's SpSpMM semantics (tgp/poolers/pan.py:190-204) with no
        long-range entries dropped."""
        if lifting:
            return self.lift(x if x is not None else batch.x, so)

        p = self.param("p", nn.initializers.ones, (self.in_channels,))
        beta = self.param("beta",
                          lambda k, s: jnp.full(s, 0.5), (2,))
        if so is None:
            score1 = batch.x @ p
            if met_degree is None:
                if met_dense is not None:
                    # reference score2: column sums of M (pan.py:195)
                    deg = met_dense.sum(axis=-2)  # [B, Nmax]
                    met_degree = deg[batch.node_graph, batch.node_pos]
                else:
                    met_degree = jax.ops.segment_sum(
                        jnp.where(batch.edge_mask, batch.edge_weight, 0.0),
                        batch.receivers, num_segments=batch.num_nodes)
            score = beta[0] * score1 + beta[1] * met_degree
            if self.min_score is None:
                score = resolve_activation(self.nonlinearity)(score)
            else:
                from tgp_tpu.ops.segment import segment_softmax

                score = segment_softmax(score, batch.node_graph,
                                        batch.num_graphs,
                                        mask=batch.node_mask)
            so = topk_select_from_scores(
                score, batch, self.ratio, self.min_score, self.s_inv_op)

        x_pool = self.reduce(batch.x, so) * self.multiplier
        if met_dense is not None:
            return PoolingOutput(
                so=so, graph=self._exact_met_connect(x_pool, met_dense, so,
                                                     batch))
        edges = sparse_connect(
            batch.senders, batch.receivers, batch.edge_weight, batch.edge_mask,
            so, ConnectConfig(
                reduce_op=self.connect_red_op,
                remove_self_loops=self.remove_self_loops,
                degree_norm=self.degree_norm,
                edge_weight_norm=self.edge_weight_norm,
            ))
        return PoolingOutput(so=so, graph=self.pooled_graph(x_pool, edges, so, batch))

    def _exact_met_connect(self, x_pool: jax.Array, met_dense: jax.Array,
                           so: SelectOutput, batch: GraphBatch) -> GraphBatch:
        """Exact pooled connectivity ``M[keep][:, keep]`` via a selection
        one-hot on the MXU, emitted as a block-diagonal masked-COO batch
        with a static ``B·K²`` edge budget."""
        from tgp_tpu.graph import DenseGraphBatch, from_dense
        from tgp_tpu.ops.sparse import postprocess_adj_dense

        B, K = so.num_graphs, so.max_clusters
        Nmax = met_dense.shape[-1]
        slot = so.cluster_index - so.node_graph * K
        keep = so.node_sel_mask
        # P[b, k, n] = 1 iff slot k of graph b holds dense position n
        P = jnp.zeros((B, K, Nmax), met_dense.dtype).at[
            so.node_graph, jnp.where(keep, slot, 0),
            batch.node_pos].add(keep.astype(met_dense.dtype))
        m_pool = jnp.einsum("bkn,bnm,bjm->bkj", P, met_dense, P)
        m_pool = postprocess_adj_dense(
            m_pool,
            remove_self_loops_flag=self.remove_self_loops,
            degree_norm=self.degree_norm,
            edge_weight_norm=self.edge_weight_norm,
        )
        out_mask = so.out_mask()
        F = x_pool.shape[-1]
        dense = DenseGraphBatch(
            x=jnp.where(out_mask[:, None], x_pool, 0.0).reshape(B, K, F),
            adj=m_pool,
            mask=out_mask.reshape(B, K),
        )
        return from_dense(dense,
                          keep_self_loops=not self.remove_self_loops)
