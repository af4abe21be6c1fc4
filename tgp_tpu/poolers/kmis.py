"""KMISPooling (reference: tgp/poolers/kmis.py:128-246; Bacciu et al. 2023).

``reduce_red_op="sum"`` (reference default, kmis.py:137) aggregates the
whole cluster with score weights; ``None`` keeps only the MIS members'
features scaled by their score (reference kmis.py:240-244)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from tgp_tpu.connect.base import ConnectConfig
from tgp_tpu.graph import GraphBatch
from tgp_tpu.poolers import register_pooler
from tgp_tpu.select.base import SelectOutput
from tgp_tpu.select.kmis import KMISSelect
from tgp_tpu.src import PoolingOutput, SRCPooling

__all__ = ["KMISPooling"]


@register_pooler("kmis")
class KMISPooling(SRCPooling):
    in_channels: Optional[int] = None
    order_k: int = 1
    scorer: str = "linear"
    score_heuristic: Optional[str] = "greedy"
    force_undirected: bool = False
    reduce_red_op: Optional[str] = "sum"
    s_inv_op: str = "transpose"
    connect_red_op: str = "sum"
    remove_self_loops: bool = True
    degree_norm: bool = False
    edge_weight_norm: bool = False

    IS_TRAINABLE = True
    IS_PRECOARSENABLE = True

    def setup(self):
        self.selector = KMISSelect(
            in_channels=self.in_channels, order_k=self.order_k,
            scorer=self.scorer, score_heuristic=self.score_heuristic,
            s_inv_op=self.s_inv_op,
            force_undirected=self.force_undirected,
        )

    def __call__(self, batch: GraphBatch, *, so: Optional[SelectOutput] = None,
                 lifting: bool = False, x: Optional[jax.Array] = None):
        if lifting:
            return self.lift(x if x is not None else batch.x, so)
        if so is None:
            so = self.selector(batch)
        if self.reduce_red_op is None:
            # keep only MIS-member features, scaled by their score
            mis = so.extras["mis"]
            x_pool = jnp.where(mis[:, None], batch.x * so.weight[:, None], 0.0)
        else:
            x_pool = self.reduce(batch.x, so)
        edges = self.connect(batch, so, ConnectConfig(
            reduce_op=self.connect_red_op,
            remove_self_loops=self.remove_self_loops,
            degree_norm=self.degree_norm,
            edge_weight_norm=self.edge_weight_norm,
        ))
        return PoolingOutput(so=so, graph=self.pooled_graph(x_pool, edges, so, batch))
