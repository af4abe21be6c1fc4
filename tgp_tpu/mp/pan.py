"""PANConv — path-integral (MET-matrix) convolution, TPU-native.

The reference example uses PyG's ``PANConv`` (+ torch_sparse SpSpMM) whose
MET matrix is ``M = Σ_{l=0}^{L} w_l A^l`` (learnable per-hop weights,
hop 0 through ``filter_size`` inclusive), **symmetrically normalized**
``M ← D_M^{-1/2} M D_M^{-1/2}`` before both the feature propagation and the
hand-off to ``PANPooling``
(reference: examples/classification_pan.py:50-52, tgp/poolers/pan.py:18-211).

TPU design: **never materialize M sparsely.**
  * feature path: ``M_norm X W`` exactly, via Horner-style iterated SpMM
    (normalization folded in: ``d^{-1/2} ⊙ Σ w_l A^l (d^{-1/2} ⊙ h)``);
  * ``met_degree`` (the pooling score term = column sums of M_norm)
    exactly, by iterated SpMM on vectors;
  * pooled connectivity: either exact values on the ``A ∪ I`` support
    (``exact_met_support``) or the FULL dense ``M_norm`` for the pooler's
    exact connect (``return_dense_met``); degrees are exact either way.
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
    #: symmetric D^-1/2 M D^-1/2 normalization (PyG PANConv semantics)
    normalize: bool = True
    #: gather exact MET values on the edge support from per-graph dense
    #: powers (cost O(B·Nmax³) — fine for small graphs); False keeps the
    #: hop-1 approximation
    exact_met_support: bool = True
    #: also return the full dense MET matrix ``[B, Nmax, Nmax]`` (including
    #: the hop-0 diagonal) as a 4th output, enabling the exact
    #: reference-parity connect in :class:`~tgp_tpu.poolers.pan.PANPooling`
    #: (no long-range entries dropped)
    return_dense_met: bool = False

    @nn.compact
    def __call__(self, batch: GraphBatch, x: Optional[jax.Array] = None
                 ) -> Tuple[jax.Array, ...]:
        """Returns ``(x_out, met_degree [N], met_edge_weight [E]
        [, met_dense [B,Nmax,Nmax]])``."""
        if x is None:
            x = batch.x
        L = self.filter_size
        # hops 0..L inclusive, like PyG's ``panentropy`` (weight has
        # ``filter_size + 1`` entries, filled 0.5)
        w = self.param("hop_weight",
                       lambda k, s: jnp.full(s, 0.5), (L + 1,))
        s, r = batch.senders, batch.receivers
        ew = jnp.where(batch.edge_mask, batch.edge_weight, 0.0)
        N = batch.num_nodes

        def met_mv(v, transpose=False):
            """Exact ``M v`` (or ``Mᵀ v``) by iterated SpMM, row-oriented:
            ``M[i,j]`` is the weight of edge ``(i → j)``, matching the dense
            ``adj[pos_s, pos_r]`` layout (A^l direction matters only for
            directed/asymmetric weights)."""
            acc = w[0] * v
            cur = v
            for l in range(1, L + 1):
                cur = (spmm(s, r, ew, cur, N) if transpose
                       else spmm(r, s, ew, cur, N))
                acc = acc + w[l] * cur
            return acc

        # unnormalized MET degree d = M·1 (row sums)
        deg = met_mv(jnp.ones((N, 1), x.dtype))[:, 0]
        deg = jnp.where(batch.node_mask, deg, 0.0)
        if self.normalize:
            dinv = jax.lax.rsqrt(jnp.clip(deg, 1e-12, None))
            dinv = jnp.where(batch.node_mask & (deg > 0), dinv, 0.0)
        else:
            dinv = jnp.ones_like(deg)

        h = nn.Dense(self.out_channels, use_bias=False)(x)
        out = dinv[:, None] * met_mv(dinv[:, None] * h)
        if self.use_bias:
            out = out + self.param("bias", nn.initializers.zeros,
                                   (self.out_channels,))
        out = jnp.where(batch.node_mask[:, None], out, 0.0)

        # met_degree for PANPooling = COLUMN sums of M_norm
        # (reference score2: scatter over col, tgp/poolers/pan.py:195)
        if self.normalize:
            met_degree = dinv * met_mv(dinv[:, None], transpose=True)[:, 0]
        else:
            met_degree = met_mv(jnp.ones((N, 1), x.dtype),
                                transpose=True)[:, 0]
        met_degree = jnp.where(batch.node_mask, met_degree, 0.0)

        need_dense = self.return_dense_met or self.exact_met_support
        if need_dense:
            from tgp_tpu.graph import to_dense

            d = to_dense(batch)
            m = d.mask.astype(d.adj.dtype)
            eye = jnp.eye(d.adj.shape[-1], dtype=d.adj.dtype)
            met = w[0] * eye * m[:, :, None]
            cur = None
            for l in range(1, L + 1):
                cur = d.adj if cur is None else jnp.einsum(
                    "bij,bjk->bik", cur, d.adj)
                met = met + w[l] * cur
            if self.normalize:
                dv = jnp.zeros(d.adj.shape[:2], d.adj.dtype).at[
                    batch.node_graph, batch.node_pos].add(
                        jnp.where(batch.node_mask, dinv, 0.0))
                met = dv[:, :, None] * met * dv[:, None, :]
            eg = batch.edge_graph
            sp = batch.node_pos[batch.senders]
            rp = batch.node_pos[batch.receivers]
            met_edge_weight = jnp.where(
                batch.edge_mask, met[eg, sp, rp], 0.0)
            if self.return_dense_met:
                return out, met_degree, met_edge_weight, met
        else:
            # hop-1 only (hop-0 is the diagonal)
            met_edge_weight = w[1] * ew if L >= 1 else jnp.zeros_like(ew)
            if self.normalize:
                met_edge_weight = met_edge_weight * dinv[s] * dinv[r]
        return out, met_degree, met_edge_weight
