"""Top-k pooling operator (reference: ``TopkPooling``,
tgp/poolers/topk.py:14-195; Gao & Ji 2019 / Cangea et al. 2018 / Knyazev
et al. 2019).

Composition: TopkSelect / BaseReduce / SparseConnect / BaseLift.  Pooled
features are the selected nodes' features scaled by their score (the reduce
path with one-node clusters) times ``multiplier``.
"""

from __future__ import annotations

from typing import Callable, Optional, Union

import jax
from flax import linen as nn

from tgp_tpu.connect.base import ConnectConfig
from tgp_tpu.graph import GraphBatch
from tgp_tpu.select.base import SelectOutput
from tgp_tpu.select.topk import TopkSelect
from tgp_tpu.src import PoolingOutput, SRCPooling

__all__ = ["TopkPooling"]


class TopkPooling(SRCPooling):
    in_channels: Optional[int] = None
    ratio: Union[int, float] = 0.5
    min_score: Optional[float] = None
    act: Union[str, Callable, None] = "tanh"
    multiplier: float = 1.0
    s_inv_op: str = "transpose"
    connect_red_op: str = "sum"
    remove_self_loops: bool = True
    degree_norm: bool = False
    edge_weight_norm: bool = False

    IS_TRAINABLE = True
    IS_PRECOARSENABLE = False

    def setup(self):
        self.selector = TopkSelect(
            in_channels=self.in_channels,
            ratio=self.ratio,
            min_score=self.min_score,
            act=self.act,
            s_inv_op=self.s_inv_op,
        )

    def _connect_cfg(self) -> ConnectConfig:
        return ConnectConfig(
            reduce_op=self.connect_red_op,
            remove_self_loops=self.remove_self_loops,
            degree_norm=self.degree_norm,
            edge_weight_norm=self.edge_weight_norm,
        )

    def __call__(self, batch: GraphBatch, *, so: Optional[SelectOutput] = None,
                 lifting: bool = False, x: Optional[jax.Array] = None
                 ) -> Union[PoolingOutput, jax.Array]:
        if lifting:
            return self.lift(x if x is not None else batch.x, so)
        if so is None:
            so = self.selector(batch)
        x_pool = self.reduce(batch.x, so) * self.multiplier
        edges = self.connect(batch, so, self._connect_cfg())
        pooled = self.pooled_graph(x_pool, edges, so, batch)
        return PoolingOutput(so=so, graph=pooled)
