"""EdgePool / edge-contraction pooling (reference:
tgp/poolers/edge_contraction.py:15-185; Diehl 2019)."""

from __future__ import annotations

from typing import Optional

import jax

from tgp_tpu.connect.base import ConnectConfig
from tgp_tpu.graph import GraphBatch
from tgp_tpu.poolers import register_pooler
from tgp_tpu.select.base import SelectOutput
from tgp_tpu.select.edge_contraction import EdgeContractionSelect
from tgp_tpu.src import PoolingOutput, SRCPooling

__all__ = ["EdgeContractionPooling"]


@register_pooler("ec")
class EdgeContractionPooling(SRCPooling):
    in_channels: int = 0
    edge_score_method: str = "softmax"
    dropout: float = 0.0
    add_to_edge_score: float = 0.5
    s_inv_op: str = "transpose"
    connect_red_op: str = "sum"
    remove_self_loops: bool = True
    degree_norm: bool = False
    edge_weight_norm: bool = False

    IS_TRAINABLE = True

    def setup(self):
        self.selector = EdgeContractionSelect(
            in_channels=self.in_channels,
            edge_score_method=self.edge_score_method,
            dropout=self.dropout,
            add_to_edge_score=self.add_to_edge_score,
            s_inv_op=self.s_inv_op,
        )

    def __call__(self, batch: GraphBatch, *, so: Optional[SelectOutput] = None,
                 lifting: bool = False, x: Optional[jax.Array] = None):
        if lifting:
            return self.lift(x if x is not None else batch.x, so)
        if so is None:
            so = self.selector(batch)
        x_pool = self.reduce(batch.x, so)
        edges = self.connect(batch, so, ConnectConfig(
            reduce_op=self.connect_red_op,
            remove_self_loops=self.remove_self_loops,
            degree_norm=self.degree_norm,
            edge_weight_norm=self.edge_weight_norm,
        ))
        return PoolingOutput(so=so, graph=self.pooled_graph(x_pool, edges, so, batch))
