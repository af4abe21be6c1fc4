"""LaPooling (reference: tgp/poolers/lapool.py:14-249; Noutahi et al. 2019).
LaPoolSelect / BaseReduce / DenseConnect / BaseLift — non-trainable but
feature-dependent, so it runs on device (unbatched-dense S layout)."""

from __future__ import annotations

from typing import Optional

import jax

from tgp_tpu.connect.base import dense_connect_unbatched
from tgp_tpu.graph import DenseGraphBatch, GraphBatch
from tgp_tpu.ops.sparse import postprocess_adj_dense
from tgp_tpu.poolers import register_pooler
from tgp_tpu.reduce.base import reduce_dense_unbatched
from tgp_tpu.select.base import SelectOutput
from tgp_tpu.select.lapool import lapool_select
from tgp_tpu.src import DenseSRCPooling, PoolingOutput

__all__ = ["LaPooling"]


@register_pooler("lap")
class LaPooling(DenseSRCPooling):
    shortest_path_reg: bool = False
    remove_self_loops: bool = True
    degree_norm: bool = True  # reference default (tgp/poolers/lapool.py:82)
    edge_weight_norm: bool = False
    s_inv_op: str = "transpose"
    sparse_output: bool = False

    IS_TRAINABLE = False

    def __call__(self, batch: GraphBatch, *, so: Optional[SelectOutput] = None,
                 lifting: bool = False, x: Optional[jax.Array] = None):
        if lifting:
            return self.lift(x if x is not None else batch.x, so)
        if so is None:
            if self.shortest_path_reg:
                # eager two-pass: device leaders → host csgraph β weights →
                # regularized selection (cannot run under jit)
                from tgp_tpu.select.lapool import shortest_path_weights

                so0 = lapool_select(batch, s_inv_op=self.s_inv_op)
                spw = shortest_path_weights(
                    batch, so0.extras["leader"], so0.extras["slot"])
                so = lapool_select(batch, shortest_path_reg=True,
                                   sp_weight=spw, s_inv_op=self.s_inv_op)
            else:
                so = lapool_select(batch, s_inv_op=self.s_inv_op)
        x_pool = reduce_dense_unbatched(
            batch.x, so.s, batch.node_graph, batch.num_graphs,
            batch.node_mask)
        adj_pool = dense_connect_unbatched(
            batch.senders, batch.receivers, batch.edge_weight, so.s,
            batch.node_graph, batch.num_graphs, batch.node_mask)
        adj_pool = postprocess_adj_dense(
            adj_pool,
            remove_self_loops_flag=self.remove_self_loops,
            degree_norm=self.degree_norm,
            edge_weight_norm=self.edge_weight_norm,
        )
        out = DenseGraphBatch(x=x_pool, adj=adj_pool, mask=so.out_mask())
        if self.sparse_output:
            return PoolingOutput(so=so, graph=self.finalize_sparse_output(out))
        return PoolingOutput(so=so, dense=out)
