"""ASAPooling (reference: tgp/poolers/asap.py:21-267; Ranjan et al.,
AAAI 2020).

Ego-network attention: ``x_q_i = lin(max_{j∈N(i)} x_j)``, per-edge attention
``att([x_q_i ‖ x_j])`` softmax-normalized over each receiver, cluster
features ``x_i = Σ_j score_e · x_j``; selection = top-k on an LEConv fitness
score; connect on the self-loop-augmented edge set.
"""

from __future__ import annotations

from typing import Callable, Optional, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from tgp_tpu.connect.base import ConnectConfig, sparse_connect
from tgp_tpu.graph import GraphBatch
from tgp_tpu.mp.leconv import LEConv
from tgp_tpu.ops.segment import segment_max, segment_softmax
from tgp_tpu.ops.sparse import add_remaining_self_loops
from tgp_tpu.poolers import register_pooler
from tgp_tpu.select.base import SelectOutput
from tgp_tpu.select.topk import topk_select_from_scores
from tgp_tpu.src import PoolingOutput, SRCPooling
from tgp_tpu.utils.activations import resolve_activation

__all__ = ["ASAPooling"]


@register_pooler("asap")
class ASAPooling(SRCPooling):
    in_channels: int = 0
    ratio: Union[int, float] = 0.5
    dropout: float = 0.0
    negative_slope: float = 0.2
    nonlinearity: Union[str, Callable, None] = "sigmoid"
    #: optional GNN computing intra-cluster features before the ego-network
    #: attention (reference ``GNN=`` arg, asap.py:101-147; None = reference
    #: default): None | 'graph_conv' | 'gcn'
    intra_gnn: Optional[str] = None
    #: include each node in its own ego network (reference
    #: ``add_self_loops``, asap.py)
    add_self_loops: bool = True
    s_inv_op: str = "transpose"
    connect_red_op: str = "sum"
    remove_self_loops: bool = True
    degree_norm: bool = False
    edge_weight_norm: bool = False

    IS_TRAINABLE = True

    def setup(self):
        self.lin = nn.Dense(self.in_channels)
        self.att = nn.Dense(1)
        self.select_scorer = LEConv(1)
        self.att_dropout = nn.Dropout(self.dropout)
        if self.intra_gnn is None:
            pass
        elif self.intra_gnn == "graph_conv":
            from tgp_tpu.mp.gcn import GraphConv

            self.gnn_intra_cluster = GraphConv(self.in_channels)
        elif self.intra_gnn == "gcn":
            from tgp_tpu.mp.gcn import GCNConv

            self.gnn_intra_cluster = GCNConv(self.in_channels)
        else:
            raise ValueError(
                f"intra_gnn must be None|graph_conv|gcn, got {self.intra_gnn!r}")

    def __call__(self, batch: GraphBatch, *, so: Optional[SelectOutput] = None,
                 lifting: bool = False, x: Optional[jax.Array] = None,
                 deterministic: bool = True):
        if lifting:
            return self.lift(x if x is not None else batch.x, so)

        N = batch.num_nodes
        if self.add_self_loops:
            s, r, w, em = add_remaining_self_loops(
                batch.senders, batch.receivers, batch.edge_weight,
                batch.edge_mask, batch.node_mask, 1.0)
        else:
            s, r, w, em = (batch.senders, batch.receivers,
                           batch.edge_weight, batch.edge_mask)

        x_in = batch.x
        if self.intra_gnn is None:
            x_pool = x_in  # reference default (asap.py:54)
        else:
            x_pool = self.gnn_intra_cluster(batch)

        # ego-network attention
        x_q = segment_max(x_pool[s], r, N, mask=em)
        x_q = jnp.where(jnp.isfinite(x_q), x_q, 0.0)
        x_q = self.lin(x_q)
        score_e = self.att(jnp.concatenate([x_q[r], x_pool[s]], -1))[:, 0]
        score_e = jax.nn.leaky_relu(score_e, self.negative_slope)
        score_e = segment_softmax(score_e, r, N, mask=em)
        if self.dropout > 0:
            # reference applies dropout to the normalized attention
            # coefficients (asap.py forward, F.dropout(score, training))
            score_e = self.att_dropout(score_e, deterministic=deterministic)

        v = x_in[s] * score_e[:, None]
        x_clustered = jax.ops.segment_sum(
            jnp.where(em[:, None], v, 0.0), r, num_segments=N)

        fitness = self.select_scorer(
            x_clustered, s, r, jnp.where(em, w, 0.0), N,
            node_mask=batch.node_mask)[:, 0]
        fitness = resolve_activation(self.nonlinearity)(fitness)

        if so is None:
            so = topk_select_from_scores(
                fitness, batch, self.ratio, None, self.s_inv_op)

        from tgp_tpu.reduce.base import reduce_sparse

        x_pooled = reduce_sparse(x_clustered, so)
        edges = sparse_connect(s, r, w, em, so, ConnectConfig(
            reduce_op=self.connect_red_op,
            remove_self_loops=self.remove_self_loops,
            degree_norm=self.degree_norm,
            edge_weight_norm=self.edge_weight_norm,
        ))
        return PoolingOutput(
            so=so, graph=self.pooled_graph(x_pooled, edges, so, batch))
