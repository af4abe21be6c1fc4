"""SAGPooling (reference: tgp/poolers/sag.py:17-228; Lee et al., ICML 2019):
top-k selection on a GNN-computed attention score ``a = GNN(X, A)``."""

from __future__ import annotations

from typing import Callable, Optional, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from tgp_tpu.connect.base import ConnectConfig
from tgp_tpu.graph import GraphBatch
from tgp_tpu.mp.gcn import GraphConv
from tgp_tpu.select.base import SelectOutput
from tgp_tpu.select.topk import topk_select_from_scores
from tgp_tpu.src import PoolingOutput, SRCPooling
from tgp_tpu.utils.activations import resolve_activation

from tgp_tpu.poolers import register_pooler

__all__ = ["SAGPooling"]


@register_pooler("sag")
class SAGPooling(SRCPooling):
    in_channels: int = 0
    ratio: Union[int, float] = 0.5
    min_score: Optional[float] = None
    multiplier: float = 1.0
    nonlinearity: Union[str, Callable, None] = "tanh"
    #: scoring GNN (reference SAGPooling's ``GNN=`` argument, sag.py:17-228):
    #: 'graph_conv' (reference default) | 'gcn' | 'le'
    gnn_kind: str = "graph_conv"
    #: arbitrary user scoring module (the reference accepts any GNN class,
    #: sag.py:108-143; here any flax module mapping ``(batch, x)`` to a
    #: per-node score ``[N]`` or ``[N, 1]``).  Overrides ``gnn_kind``.
    score_gnn: Optional[nn.Module] = None
    s_inv_op: str = "transpose"
    connect_red_op: str = "sum"
    remove_self_loops: bool = True
    degree_norm: bool = False
    edge_weight_norm: bool = False
    #: "compact" | "masked" | "auto" — see
    #: :class:`~tgp_tpu.poolers.topk.TopkPooling` (SAG's connect is the
    #: same pure kept-node subgraph, so masked in-place pooling applies)
    pool_mode: str = "auto"

    IS_TRAINABLE = True

    def setup(self):
        if self.score_gnn is not None:
            self.gnn = self.score_gnn
        elif self.gnn_kind == "graph_conv":
            self.gnn = GraphConv(1)
        elif self.gnn_kind == "gcn":
            from tgp_tpu.mp.gcn import GCNConv

            self.gnn = GCNConv(1)
        elif self.gnn_kind == "le":
            from tgp_tpu.mp.leconv import LEConv

            self.gnn = LEConv(1)
        else:
            raise ValueError(
                f"gnn_kind must be graph_conv|gcn|le, got {self.gnn_kind!r}")

    def score(self, batch: GraphBatch,
              attn: Optional[jax.Array] = None) -> jax.Array:
        """Activated per-node attention score ``a = act(GNN(X, A))`` —
        addressable via ``pooler.apply(..., method=...)`` so the sharded
        path (tgp_tpu/parallel/sparse_pool.py) scores with the SAME GNN
        parameters (VERDICT r4 #2).  With one-hop scorers the aggregation
        is receiver-local, so a shard's scores are exact given the gathered
        features and its local (receiver-owned) edges."""
        if self.score_gnn is not None:
            score = self.gnn(batch, attn)
            score = score[:, 0] if score.ndim > 1 else score
        elif self.gnn_kind == "le":
            score = self.gnn(
                attn if attn is not None else batch.x, batch.senders,
                batch.receivers, batch.edge_weight, batch.num_nodes,
                batch.node_mask)[:, 0]
        else:
            score = self.gnn(batch, attn)[:, 0]
        if self.min_score is None:
            score = resolve_activation(self.nonlinearity)(score)
        else:
            from tgp_tpu.ops.segment import segment_softmax

            score = segment_softmax(score, batch.node_graph,
                                    batch.num_graphs, mask=batch.node_mask)
        return score

    def __call__(self, batch: GraphBatch, *, so: Optional[SelectOutput] = None,
                 lifting: bool = False, x: Optional[jax.Array] = None,
                 attn: Optional[jax.Array] = None):
        if lifting:
            return self.lift(x if x is not None else batch.x, so)
        if so is None:
            so = topk_select_from_scores(
                self.score(batch, attn), batch, self.ratio, self.min_score,
                self.s_inv_op)
        from tgp_tpu.poolers._masked import masked_pool, use_masked_pool

        if use_masked_pool(self.pool_mode, batch,
                           degree_norm=self.degree_norm,
                           edge_weight_norm=self.edge_weight_norm):
            return masked_pool(batch, so, multiplier=self.multiplier,
                               remove_self_loops=self.remove_self_loops)
        x_pool = self.reduce(batch.x, so) * self.multiplier
        edges = self.connect(batch, so, ConnectConfig(
            reduce_op=self.connect_red_op,
            remove_self_loops=self.remove_self_loops,
            degree_norm=self.degree_norm,
            edge_weight_norm=self.edge_weight_norm,
        ))
        return PoolingOutput(so=so, graph=self.pooled_graph(x_pool, edges, so, batch))

    def lift(self, x_pool: jax.Array, so: SelectOutput) -> jax.Array:
        if so.extras.get("pool_mode") == "masked":
            from tgp_tpu.poolers._masked import masked_lift

            return masked_lift(x_pool, so, self.s_inv_op)
        return super().lift(x_pool, so)
