"""GraclusPooling (reference: tgp/poolers/graclus.py:69-159; Dhillon et al.
2007).  Non-trainable heavy-edge matching; precoarsenable."""

from __future__ import annotations

from typing import Optional

import jax

from tgp_tpu.connect.base import ConnectConfig
from tgp_tpu.graph import GraphBatch
from tgp_tpu.poolers import register_pooler
from tgp_tpu.select.base import SelectOutput
from tgp_tpu.select.graclus import graclus_select
from tgp_tpu.src import PoolingOutput, SRCPooling

__all__ = ["GraclusPooling"]


@register_pooler("graclus")
class GraclusPooling(SRCPooling):
    weighted: bool = True
    reduce_red_op: str = "sum"
    s_inv_op: str = "transpose"
    connect_red_op: str = "sum"
    remove_self_loops: bool = True
    degree_norm: bool = False
    edge_weight_norm: bool = False

    IS_PRECOARSENABLE = True

    def __call__(self, batch: GraphBatch, *, so: Optional[SelectOutput] = None,
                 lifting: bool = False, x: Optional[jax.Array] = None):
        if lifting:
            return self.lift(x if x is not None else batch.x, so)
        if so is None:
            so = graclus_select(batch, weighted=self.weighted,
                                s_inv_op=self.s_inv_op)
        x_pool = self.reduce(batch.x, so)
        edges = self.connect(batch, so, ConnectConfig(
            reduce_op=self.connect_red_op,
            remove_self_loops=self.remove_self_loops,
            degree_norm=self.degree_norm,
            edge_weight_norm=self.edge_weight_norm,
        ))
        return PoolingOutput(so=so, graph=self.pooled_graph(x_pool, edges, so, batch))
