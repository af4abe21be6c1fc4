"""MaxCutPool (reference: tgp/poolers/maxcut.py:100-270; Abate & Bianchi,
ICLR 2025).  MaxCutSelect / BaseReduce / SparseConnect (always on the full
assignment) / BaseLift, with the ``maxcut_loss`` −zᵀAz/vol."""

from __future__ import annotations

from typing import Optional, Sequence, Union

import jax

from tgp_tpu.connect.base import ConnectConfig
from tgp_tpu.graph import GraphBatch
from tgp_tpu.losses import maxcut_loss
from tgp_tpu.poolers import register_pooler
from tgp_tpu.select.base import SelectOutput
from tgp_tpu.select.maxcut import _DEFAULT_MP, MaxCutSelect
from tgp_tpu.src import PoolingOutput, SRCPooling

__all__ = ["MaxCutPooling"]


@register_pooler("maxcut")
class MaxCutPooling(SRCPooling):
    in_channels: int = 0
    ratio: Union[int, float] = 0.5
    loss_coeff: float = 1.0
    #: upgrade the top-k selection to a total assignment (reference
    #: ``assign_all_nodes``, maxcut.py:100-270; False = partial top-k
    #: selection like TopkPooling)
    assign_all_nodes: bool = True
    max_iter: int = 5
    mp_units: Sequence[int] = _DEFAULT_MP
    mp_act: str = "tanh"
    mlp_units: Sequence[int] = (16, 16)
    mlp_act: str = "relu"
    #: final score activation (reference maxcut.py:111 ``act="tanh"``)
    act: str = "tanh"
    delta: float = 2.0
    s_inv_op: str = "transpose"
    connect_red_op: str = "sum"
    remove_self_loops: bool = True
    degree_norm: bool = False
    edge_weight_norm: bool = False
    #: propagation engine for the ScoreNet δ-GCN rounds AND the
    #: assign-all-nodes voting: 'dense' = batched matmuls on the MXU,
    #: 'sparse' = scatter/lexsort, 'auto' = dense under the B·Nmax² budget
    mp_impl: str = "auto"

    IS_TRAINABLE = True
    HAS_LOSS = True

    def setup(self):
        self.selector = MaxCutSelect(
            in_channels=self.in_channels, ratio=self.ratio,
            do_assign_all_nodes=self.assign_all_nodes, max_iter=self.max_iter,
            mp_units=self.mp_units, mp_act=self.mp_act,
            mlp_units=self.mlp_units, mlp_act=self.mlp_act,
            act=self.act, delta=self.delta, s_inv_op=self.s_inv_op,
            mp_impl=self.mp_impl,
        )

    def __call__(self, batch: GraphBatch, *, so: Optional[SelectOutput] = None,
                 lifting: bool = False, x: Optional[jax.Array] = None):
        if lifting:
            return self.lift(x if x is not None else batch.x, so)
        if so is None:
            so = self.selector(batch)
        # a caller-supplied so (structural caching) may not carry the
        # selector's scores — the loss needs them, so it is skipped then
        loss = {}
        if "scores" in so.extras:
            loss["maxcut_loss"] = self.loss_coeff * maxcut_loss(
                so.extras["scores"], batch.senders, batch.receivers,
                batch.edge_weight, batch.node_graph, batch.num_graphs)
        x_pool = self.reduce(batch.x, so)
        # connect is ALWAYS on the full assignment (reference
        # maxcut.py:200-214 upgrades a partial selection just for connect);
        # reduce above keeps the partial top-k features
        conn_so = so
        if so.partial:
            from tgp_tpu.ops.assignment import (
                assign_all_nodes as _assign_all)

            conn_so = _assign_all(
                so, batch.senders, batch.receivers, batch.edge_mask,
                max_iter=self.max_iter, node_pos=batch.node_pos,
                max_nodes=batch.max_nodes, impl=self.mp_impl)
        edges = self.connect(batch, conn_so, ConnectConfig(
            reduce_op=self.connect_red_op,
            remove_self_loops=self.remove_self_loops,
            degree_norm=self.degree_norm,
            edge_weight_norm=self.edge_weight_norm,
        ))
        return PoolingOutput(so=so, loss=loss,
                             graph=self.pooled_graph(x_pool, edges, so, batch))
