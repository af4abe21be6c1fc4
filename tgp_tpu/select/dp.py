"""Dirichlet-process stick-breaking selector (reference: ``DPSelect``,
tgp/select/dp_select.py:13-176; used by BNPool).

``MLP(X) → softplus → (α, β) → Beta(α, β).rsample() → stick-breaking π``.
Reparameterized Beta sampling uses two Gamma draws (``jax.random.gamma`` has
implicit-reparameterization gradients), replacing torch's
``Beta.rsample``.  The posterior parameters ride in ``extras['q_alpha']`` /
``extras['q_beta']`` for BNPool's KL term.
"""

from __future__ import annotations

from typing import List, Optional, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from tgp_tpu.graph import DenseGraphBatch, GraphBatch
from tgp_tpu.select.base import SelectOutput
from tgp_tpu.select.mlp import SelectMLP

__all__ = ["DPSelect", "stick_breaking"]


def stick_breaking(z: jax.Array) -> jax.Array:
    """Log-space stick-breaking: ``π_k = z_k · Π_{j<k}(1−z_j)`` with
    ``π_K = Π_j (1−z_j)`` (reference: dp_select.py:113-133)."""
    log_z = jnp.log(jnp.clip(z, 1e-12, None))
    log_1mz = jnp.log(jnp.clip(1 - z, 1e-12, None))
    cum = jnp.cumsum(log_1mz, axis=-1)
    first = log_z[..., :1]
    middle = log_z[..., 1:] + cum[..., :-1]
    last = cum[..., -1:]
    return jnp.exp(jnp.concatenate([first, middle, last], axis=-1))


class DPSelect(nn.Module):
    in_channels: Union[int, List[int]] = 0
    k: int = 8
    batched: bool = True
    act: Optional[str] = None
    dropout: float = 0.0
    s_inv_op: str = "transpose"
    #: key each node's Beta draws by ``fold_in(key, graph).fold_in(pos)``
    #: instead of one batch-level key: the sampled ``s`` then depends only
    #: on each node's identity, so it is IDENTICAL across layouts —
    #: batched [B,N] vs flat, and single-device vs node-sharded
    #: (tgp_tpu/parallel/dense_pool.py requires this for exact sharded
    #: loss parity).  Slightly slower (per-node key folding).
    per_node_keys: bool = False

    @nn.compact
    def __call__(self, batch, deterministic: bool = True) -> SelectOutput:
        ch = ([self.in_channels] if isinstance(self.in_channels, int)
              else list(self.in_channels))
        mlp = SelectMLP(channels=ch, k=2 * (self.k - 1), act=self.act,
                        dropout=self.dropout)
        x = batch.x
        out = jnp.clip(jax.nn.softplus(mlp(x, deterministic)), 1e-3, 1e3)
        q_alpha, q_beta = jnp.split(out, 2, axis=-1)

        key = self.make_rng("sample")
        if self.per_node_keys:
            if self.batched:
                B, N = x.shape[0], x.shape[1]
                gids = jnp.repeat(jnp.arange(B, dtype=jnp.uint32), N)
                pos = jnp.tile(jnp.arange(N, dtype=jnp.uint32), B)
                a2 = q_alpha.reshape(B * N, -1)
                b2 = q_beta.reshape(B * N, -1)
            else:
                gids = batch.node_graph.astype(jnp.uint32)
                pos = batch.node_pos.astype(jnp.uint32)
                a2, b2 = q_alpha, q_beta

            def draw(g, p, a, b):
                kk = jax.random.fold_in(jax.random.fold_in(key, g), p)
                k1, k2 = jax.random.split(kk)
                return jax.random.gamma(k1, a), jax.random.gamma(k2, b)

            g1, g2 = jax.vmap(draw)(gids, pos, a2, b2)
            g1 = g1.reshape(q_alpha.shape)
            g2 = g2.reshape(q_beta.shape)
        else:
            k1, k2 = jax.random.split(key)
            g1 = jax.random.gamma(k1, q_alpha)
            g2 = jax.random.gamma(k2, q_beta)
        z = jnp.clip(g1 / jnp.clip(g1 + g2, 1e-12, None), 1e-6, 1 - 1e-6)
        s = stick_breaking(z)

        extras = {"q_alpha": q_alpha, "q_beta": q_beta}
        if self.batched:
            assert isinstance(batch, DenseGraphBatch)
            s = s * batch.mask[..., None]
            return SelectOutput(
                s=s, in_mask=batch.mask, num_clusters=self.k,
                num_graphs=batch.num_graphs, max_clusters=self.k,
                s_inv_op=self.s_inv_op, extras=extras)
        assert isinstance(batch, GraphBatch)
        s = s * batch.node_mask[:, None]
        return SelectOutput(
            s=s, node_graph=batch.node_graph, node_mask=batch.node_mask,
            num_clusters=self.k, num_graphs=batch.num_graphs,
            max_clusters=self.k, s_inv_op=self.s_inv_op, extras=extras)
