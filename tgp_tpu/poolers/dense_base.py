"""Shared skeleton of the dense soft-cluster pooler family.

Every dense pooler (MinCut/DiffPool/DMoN/HOSC/JustBalance/ACC/BNPool/...)
shares one forward skeleton (reference canonical instance:
tgp/poolers/mincut.py:150-289, verified identical across the family):

  batched:   densify → select (softmax MLP) → reduce (SᵀX) →
             connect (SᵀAS) → compute_loss → postprocess →
             [sparse_output → block-diagonal sparse batch]
  unbatched: select ([N,K] flat) → compute_sparse_loss → reduce
             (segment outer) → connect (SpMM twin) → postprocess

Subclasses override :meth:`compute_loss` / :meth:`compute_sparse_loss`
(returning *identical scalars* — the twin-equality contract tested by
tests/poolers/test_dense_batched_vs_unbatched.py).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Union

import jax
import jax.numpy as jnp

from tgp_tpu.connect.base import dense_connect, dense_connect_unbatched
from tgp_tpu.graph import DenseGraphBatch, GraphBatch
from tgp_tpu.ops.sparse import postprocess_adj_dense
from tgp_tpu.reduce.base import reduce_dense_batched, reduce_dense_unbatched
from tgp_tpu.select.base import SelectOutput
from tgp_tpu.select.mlp import MLPSelect
from tgp_tpu.src import DenseSRCPooling, PoolingOutput

__all__ = ["DenseClusterPooling"]


class DenseClusterPooling(DenseSRCPooling):
    """Base for MLPSelect-driven dense poolers.  Subclasses add loss-coeff
    fields and the two loss hooks."""

    in_channels: Union[int, List[int], None] = None
    k: int = 8
    act: Optional[str] = None
    dropout: float = 0.0
    remove_self_loops: bool = True
    degree_norm: bool = True
    edge_weight_norm: bool = False
    adj_transpose: bool = False
    s_inv_op: str = "transpose"
    batched: bool = True
    sparse_output: bool = False

    IS_TRAINABLE = True
    HAS_LOSS = True

    def setup(self):
        self.selector = MLPSelect(
            in_channels=self.in_channels, k=self.k, batched=self.batched,
            act=self.act, dropout=self.dropout, s_inv_op=self.s_inv_op,
        )

    # ---- loss hooks (subclass responsibility) -------------------------
    def compute_loss(self, dense: DenseGraphBatch, so: SelectOutput,
                     adj_pool: jax.Array) -> Dict[str, jax.Array]:
        return {}

    def compute_sparse_loss(self, batch: GraphBatch, so: SelectOutput
                            ) -> Dict[str, jax.Array]:
        return {}

    # ---- shared forward ----------------------------------------------
    def __call__(self, batch, *, so: Optional[SelectOutput] = None,
                 lifting: bool = False, x: Optional[jax.Array] = None,
                 deterministic: bool = True):
        if lifting:
            return self.lift(x if x is not None else batch.x, so)

        if self.batched:
            dense = self.ensure_dense(batch, self.adj_transpose)
            if so is None:
                so = self.selector(dense, deterministic)
            x_pool = reduce_dense_batched(dense.x, so.s)
            adj_pool_raw = dense_connect(dense.adj, so.s)
            loss = self.compute_loss(dense, so, adj_pool_raw)
            adj_pool = postprocess_adj_dense(
                adj_pool_raw,
                remove_self_loops_flag=self.remove_self_loops,
                degree_norm=self.degree_norm,
                edge_weight_norm=self.edge_weight_norm,
                adj_transpose=self.adj_transpose,
            )
            out = DenseGraphBatch(x=x_pool, adj=adj_pool, mask=so.out_mask())
        else:
            assert isinstance(batch, GraphBatch), (
                "unbatched dense pooler expects a flat GraphBatch"
            )
            if so is None:
                so = self.selector(batch, deterministic)
            loss = self.compute_sparse_loss(batch, so)
            x_pool = reduce_dense_unbatched(
                batch.x, so.s, batch.node_graph, batch.num_graphs,
                batch.node_mask,
            )
            adj_pool = dense_connect_unbatched(
                batch.senders, batch.receivers, batch.edge_weight, so.s,
                batch.node_graph, batch.num_graphs, batch.node_mask,
            )
            adj_pool = postprocess_adj_dense(
                adj_pool,
                remove_self_loops_flag=self.remove_self_loops,
                degree_norm=self.degree_norm,
                edge_weight_norm=self.edge_weight_norm,
                adj_transpose=self.adj_transpose,
            )
            out = DenseGraphBatch(x=x_pool, adj=adj_pool, mask=so.out_mask())

        if self.sparse_output:
            return PoolingOutput(so=so, graph=self.finalize_sparse_output(out),
                                 loss=loss)
        return PoolingOutput(so=so, dense=out, loss=loss)
