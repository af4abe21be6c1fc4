"""LEConv — local-extremum convolution (PyG ``LEConv``; the select scorer of
ASAPooling, reference tgp/poolers/asap.py:21-267):

``x'_i = W₁x_i + Σ_{j∈N(i)} w_{ji} (W₂x_i − W₃x_j)``
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from tgp_tpu.ops.segment import segment_sum

__all__ = ["LEConv"]


class LEConv(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x, senders, receivers, edge_weight, num_nodes: int,
                 node_mask=None):
        a = nn.Dense(self.out_channels, use_bias=True)(x)   # W1 x  (root)
        b = nn.Dense(self.out_channels, use_bias=False)(x)  # W2 x  (self)
        c = nn.Dense(self.out_channels, use_bias=False)(x)  # W3 x  (neighbor)
        # per-edge message into receiver i from sender j: w_ji (W2 x_i − W3 x_j)
        msg = edge_weight[:, None] * (b[receivers] - c[senders])
        agg = jax.ops.segment_sum(msg, receivers, num_segments=num_nodes)
        out = a + agg
        if node_mask is not None:
            out = jnp.where(node_mask[:, None], out, 0.0)
        return out
