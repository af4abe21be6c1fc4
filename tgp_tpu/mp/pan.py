"""PANConv — path-integral (MET-matrix) convolution, TPU-native.

The reference example uses PyG's ``PANConv`` (+ torch_sparse SpSpMM) whose
MET matrix is ``M = Σ_{l=0}^{L-1} w_l A^l`` (learnable per-hop weights),
feeding ``PANPooling`` with ``M`` and its degrees
(reference: examples/classification_pan.py:50-52, tgp/poolers/pan.py:18-211).

TPU design: **never materialize M.**
  * feature path: ``MXW`` exactly, by Horner-style iterated SpMM;
  * ``met_degree`` = ``M·1`` exactly, by iterated SpMM on ones;
  * pooled connectivity: M restricted to the ``A ∪ I`` support with
    **exact** values from per-graph dense powers (``exact_met_support``,
    default) — long-range entries outside the support are dropped (the
    reference's SpSpMM grows the support dynamically, which has no
    static-shape equivalent; degrees remain exact either way).
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
    #: gather exact MET values on the edge support from per-graph dense
    #: powers (cost O(B·Nmax³) — fine for small graphs); False keeps the
    #: hop-1 approximation
    exact_met_support: bool = True

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
        if self.exact_met_support:
            # exact M values on the original edge support, via per-graph
            # dense powers gathered at edge positions (graphs in the MET
            # use case are small — MUTAG-sized — so [B, Nmax, Nmax] powers
            # are cheap and stay on the MXU)
            from tgp_tpu.graph import to_dense

            d = to_dense(batch)
            acc_m = jnp.zeros_like(d.adj)
            cur = None
            for l in range(1, L):
                cur = d.adj if cur is None else jnp.einsum(
                    "bij,bjk->bik", cur, d.adj)
                acc_m = acc_m + w[l] * cur
            eg = batch.edge_graph
            sp = batch.node_pos[batch.senders]
            rp = batch.node_pos[batch.receivers]
            met_edge_weight = jnp.where(
                batch.edge_mask, acc_m[eg, sp, rp], 0.0)
        else:
            # hop-1 only (hop-0 is the diagonal)
            met_edge_weight = w[1] * ew if L > 1 else jnp.zeros_like(ew)
        return out, met_degree, met_edge_weight
