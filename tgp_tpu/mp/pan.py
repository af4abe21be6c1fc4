"""PANConv — path-integral (MET-matrix) convolution, TPU-native.

The reference example uses PyG's ``PANConv`` (+ torch_sparse SpSpMM) whose
MET matrix is ``M = Σ_{l=0}^{L-1} w_l A^l`` (learnable per-hop weights),
feeding ``PANPooling`` with ``M`` and its degrees
(reference: examples/classification_pan.py:50-52, tgp/poolers/pan.py:18-211).

TPU design: **never materialize M.**
  * feature path: ``MXW`` exactly, by Horner-style iterated SpMM;
  * ``met_degree`` = ``M·1`` exactly, by iterated SpMM on ones;
  * for the pooled graph's connectivity, M restricted to the ``A ∪ I``
    support: exact for hops 0 and 1; higher-hop long-range entries fall
    outside the static edge budget and are dropped (documented deviation —
    the reference's SpSpMM grows the support dynamically, which has no
    static-shape equivalent).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from tgp_tpu.graph import GraphBatch
from tgp_tpu.ops.sparse import spmm

__all__ = ["PANConv"]


class PANConv(nn.Module):
    out_channels: int
    filter_size: int = 3
    use_bias: bool = True

    @nn.compact
    def __call__(self, batch: GraphBatch, x: Optional[jax.Array] = None
                 ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """Returns ``(x_out, met_degree [N], met_edge_weight [E])``."""
        if x is None:
            x = batch.x
        L = self.filter_size
        w = self.param("hop_weight",
                       lambda k, s: jnp.ones(s) / jnp.arange(1, L + 1),
                       (L,))
        s, r = batch.senders, batch.receivers
        ew = jnp.where(batch.edge_mask, batch.edge_weight, 0.0)
        N = batch.num_nodes

        h = nn.Dense(self.out_channels, use_bias=False)(x)
        # M h = Σ_l w_l A^l h  (Horner: accumulate powers)
        acc = w[0] * h
        ones = jnp.ones((N, 1), h.dtype)
        deg_acc = w[0] * ones
        cur_h, cur_1 = h, ones
        for l in range(1, L):
            cur_h = spmm(s, r, ew, cur_h, N)
            cur_1 = spmm(s, r, ew, cur_1, N)
            acc = acc + w[l] * cur_h
            deg_acc = deg_acc + w[l] * cur_1
        out = acc
        if self.use_bias:
            out = out + self.param("bias", nn.initializers.zeros,
                                   (self.out_channels,))
        out = jnp.where(batch.node_mask[:, None], out, 0.0)
        met_degree = jnp.where(batch.node_mask, deg_acc[:, 0], 0.0)
        # M on the original edge support: hop-1 term (hop-0 is the diagonal)
        met_edge_weight = w[1] * ew if L > 1 else jnp.zeros_like(ew)
        return out, met_degree, met_edge_weight
