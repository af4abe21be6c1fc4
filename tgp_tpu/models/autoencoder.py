"""Hierarchical autoencoder for node-level tasks — the lift/unpool path
(reference: examples/node_class.py:88-141): encoder MP → pool → bottleneck
MP on the pooled graph → **lift** → decoder MP → per-node logits."""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from tgp_tpu.graph import GraphBatch
from tgp_tpu.mp.gcn import GCNConv
from tgp_tpu.src import PoolingOutput

__all__ = ["PoolLiftNodeClassifier"]


class PoolLiftNodeClassifier(nn.Module):
    pooler: nn.Module
    num_classes: int
    hidden: int = 64

    @nn.compact
    def __call__(self, batch: GraphBatch) -> Tuple[jax.Array, PoolingOutput]:
        h = nn.relu(GCNConv(self.hidden)(batch))
        enc = batch.with_features(h)

        out: PoolingOutput = self.pooler(enc)

        if out.graph is not None:
            pooled = out.graph
            hp = nn.relu(GCNConv(self.hidden)(pooled))
        else:
            pooled = out.dense
            hp = nn.relu(GCNConv(self.hidden)(pooled))
            # flatten [B,K,F] so the lift sees the pooled feature matrix
        x_lift = self.pooler(enc, so=out.so, lifting=True, x=hp)
        if x_lift.ndim == 3:  # dense poolers lift back to [B,Nmax,F]
            # re-pack into the flat node space
            x_lift = x_lift[batch.node_graph, batch.node_pos]
        h = jnp.concatenate([h, x_lift], axis=-1)
        h = nn.relu(GCNConv(self.hidden)(batch, h))
        logits = nn.Dense(self.num_classes)(h)
        return logits, out
