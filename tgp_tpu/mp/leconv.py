"""LEConv — local-extremum convolution (PyG ``LEConv``; the select scorer of
ASAPooling, reference tgp/poolers/asap.py:21-267):

``x'_i = W₃x_i + b₃ + Σ_{j∈N(i)} w_{ji} ((W₁x_j + b₁) − W₂x_i)``

(PyG layout: lin1 = neighbor projection with bias, lin2 = self projection
without bias, lin3 = root projection with bias.  The Σ w_{ji} b₁ term is
degree-dependent, so the bias placement is semantically meaningful.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["LEConv"]


class LEConv(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x, senders, receivers, edge_weight, num_nodes: int,
                 node_mask=None):
        a = nn.Dense(self.out_channels, use_bias=True)(x)   # lin1 (neighbor)
        b = nn.Dense(self.out_channels, use_bias=False)(x)  # lin2 (self)
        root = nn.Dense(self.out_channels, use_bias=True)(x)  # lin3 (root)
        # per-edge message into receiver i from sender j: w_ji (a_j − b_i)
        msg = edge_weight[:, None] * (a[senders] - b[receivers])
        agg = jax.ops.segment_sum(msg, receivers, num_segments=num_nodes)
        out = root + agg
        if node_mask is not None:
            out = jnp.where(node_mask[:, None], out, 0.0)
        return out
