"""NoPool — identity pooling (reference: tgp/poolers/nopool.py:13-110 with
``IdentitySelect``, tgp/select/identity_select.py:26-67).  Useful as a
baseline that keeps the pipeline shape."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from tgp_tpu.graph import GraphBatch
from tgp_tpu.poolers import register_pooler
from tgp_tpu.select.base import SelectOutput
from tgp_tpu.src import PoolingOutput, SRCPooling

__all__ = ["NoPool", "identity_select"]


def identity_select(batch: GraphBatch) -> SelectOutput:
    """Each node maps to itself (IdentitySelect)."""
    N = batch.num_nodes
    idx = jnp.arange(N, dtype=jnp.int32)
    return SelectOutput(
        cluster_index=idx,
        weight=jnp.ones(N, jnp.float32),
        node_sel_mask=batch.node_mask,
        node_graph=batch.node_graph,
        node_mask=batch.node_mask,
        cluster_graph=batch.node_graph,
        cluster_pos=batch.node_pos,
        num_clusters=N,
        num_graphs=batch.num_graphs,
        max_clusters=batch.max_nodes,
        partial=True,  # identity: no duplicate edges to merge
    )


@register_pooler("nopool")
class NoPool(SRCPooling):
    IS_PRECOARSENABLE = True

    def __call__(self, batch: GraphBatch, *, so: Optional[SelectOutput] = None,
                 lifting: bool = False, x: Optional[jax.Array] = None):
        if lifting:
            return self.lift(x if x is not None else batch.x, so)
        if so is None:
            so = identity_select(batch)
        return PoolingOutput(so=so, graph=batch)
