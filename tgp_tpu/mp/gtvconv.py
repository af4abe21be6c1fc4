"""GTVConv — graph total-variation convolution (reference:
tgp/mp/gtvconv.py:43-170; Hansen & Bianchi, ICML 2023; pairs with
AsymCheegerCutPooling to form TVGNN).

``out = act((I − δ·L_Γ) X W + b)`` where Γ reweights each edge by
``w_ij / max(|x_iW − x_jW|₁, ε)``.  Dual paths: sparse masked-COO (SpMM) and
dense ``[B,N,N]`` (einsum), mirroring the reference's two forwards.
"""

from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from tgp_tpu.graph import DenseGraphBatch, GraphBatch
from tgp_tpu.ops.segment import segment_sum

__all__ = ["GTVConv"]


class GTVConv(nn.Module):
    out_channels: int
    delta_coeff: float = 1.0
    eps: float = 1e-3
    act: Optional[str] = "relu"
    use_bias: bool = True

    @nn.compact
    def __call__(self, batch: Union[GraphBatch, DenseGraphBatch],
                 x: Optional[jax.Array] = None) -> jax.Array:
        from tgp_tpu.utils.activations import resolve_activation

        if x is None:
            x = batch.x
        w_mat = self.param("weight", nn.initializers.kaiming_normal(),
                           (x.shape[-1], self.out_channels))
        h = x @ w_mat

        if isinstance(batch, DenseGraphBatch):
            adj = batch.adj
            # per-pair |h_i − h_j|₁ only where adj != 0
            diff = jnp.sum(jnp.abs(h[:, :, None, :] - h[:, None, :, :]), -1)
            gamma = adj / jnp.clip(diff, self.eps, None)
            gamma = jnp.where(adj != 0, gamma, 0.0)
            deg = gamma.sum(-1)
            N = adj.shape[-1]
            eye = jnp.eye(N, dtype=h.dtype)
            lap = -gamma + deg[..., None] * eye
            mod = -self.delta_coeff * lap + eye
            out = jnp.einsum("bnm,bmf->bnf", mod, h)
            if self.use_bias:
                out = out + self.param("bias", nn.initializers.zeros,
                                       (self.out_channels,))
            out = out * batch.mask[..., None]
        else:
            s, r, em = batch.senders, batch.receivers, batch.edge_mask
            N = batch.num_nodes
            abs_diff = jnp.sum(jnp.abs(h[s] - h[r]), -1)
            gamma = batch.edge_weight / jnp.clip(abs_diff, self.eps, None)
            gamma = jnp.where(em, gamma, 0.0)
            # (I − δL_Γ) h = h − δ·(D_Γ h − Γ h).  NOTE: aggregation is at
            # SENDERS (gathering h[receivers]) — the reference GTVConv runs
            # propagate with flow="target_to_source" (tgp/mp/gtvconv.py:75),
            # the transpose of GCNConv's flow, which is exactly what makes
            # this twin the dense `mod @ h` row-aggregation above.
            deg = segment_sum(gamma, s, N)
            neigh = jax.ops.segment_sum(gamma[:, None] * h[r], s,
                                        num_segments=N)
            out = h - self.delta_coeff * (deg[:, None] * h - neigh)
            if self.use_bias:
                out = out + self.param("bias", nn.initializers.zeros,
                                       (self.out_channels,))
            out = jnp.where(batch.node_mask[:, None], out, 0.0)
        return resolve_activation(self.act)(out)
