"""End-to-end model assemblies (the reference's example ``Net``s).

:class:`PoolingClassifier` mirrors ``examples/classification.py:96-121``:
MP → pool → MP on the pooled graph → global readout → linear head, with the
pooler's aux losses surfaced for the training loss.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from tgp_tpu.graph import DenseGraphBatch, GraphBatch
from tgp_tpu.mp.gcn import GCNConv
from tgp_tpu.reduce.global_reduce import global_reduce
from tgp_tpu.src import PoolingOutput

__all__ = ["PoolingClassifier"]


class PoolingClassifier(nn.Module):
    """GCN → pool → GCN → readout → linear classifier."""

    pooler: nn.Module
    num_classes: int
    hidden: int = 64
    num_pre_layers: int = 1
    num_post_layers: int = 1
    readout: str = "sum"
    use_pallas: bool = False  # Pallas SpMM on sorted-edge input batches

    @nn.compact
    def __call__(self, batch: GraphBatch) -> Tuple[jax.Array, PoolingOutput]:
        x = batch.x
        for _ in range(self.num_pre_layers):
            x = nn.relu(GCNConv(self.hidden, use_pallas=self.use_pallas)(batch, x))
        batch = batch.with_features(x)

        out: PoolingOutput = self.pooler(batch)

        if out.graph is not None:
            pooled = out.graph
            h = pooled.x
            for _ in range(self.num_post_layers):
                h = nn.relu(GCNConv(self.hidden)(pooled, h))
            z = global_reduce(
                h, node_graph=pooled.node_graph, num_graphs=pooled.num_graphs,
                node_mask=pooled.node_mask, op=self.readout,
            )
        else:
            pooled = out.dense
            h = pooled.x
            for _ in range(self.num_post_layers):
                h = nn.relu(GCNConv(self.hidden)(pooled, h))
            z = global_reduce(h, mask=pooled.mask, op=self.readout)

        z = nn.relu(nn.Dense(self.hidden)(z))
        logits = nn.Dense(self.num_classes)(z)
        return logits, out
