"""Negative edge sampling under static shapes (for BNPool's sparse
reconstruction loss).

Reference: ``negative_edge_sampling`` / ``batched_negative_edge_sampling``
(tgp/utils/ops.py:636-859) draw a *dynamic* number of non-edges per graph
with rejection.  TPU design: draw exactly one candidate negative pair per
positive-edge slot (so ``E_neg = E`` statically, preserving the per-graph
edge distribution), sampling both endpoints uniformly from the edge's own
graph.  Candidates that happen to collide with a real edge are **masked out**
(detected by a sorted membership test) rather than re-drawn — a fixed-shape
approximation of rejection sampling; the loss only averages over surviving
samples.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from tgp_tpu.graph import GraphBatch

__all__ = ["negative_edge_sampling"]


def negative_edge_sampling(key: jax.Array, batch: GraphBatch
                           ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns ``(neg_senders, neg_receivers, neg_mask)``, each ``[E]``.

    Requires the collator's packed layout (valid nodes contiguous per graph,
    padding trailing) so per-graph uniform node sampling is
    ``start[g] + floor(u · n_g)``.
    """
    E = batch.num_edges
    n_g = batch.nodes_per_graph()  # [B]
    start = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(n_g)[:-1].astype(jnp.int32)])
    eg = batch.edge_graph  # [E]
    k1, k2 = jax.random.split(key)
    u1 = jax.random.uniform(k1, (E,))
    u2 = jax.random.uniform(k2, (E,))
    n_e = jnp.maximum(n_g[eg], 1)
    src = start[eg] + jnp.floor(u1 * n_e).astype(jnp.int32)
    dst = start[eg] + jnp.floor(u2 * n_e).astype(jnp.int32)
    src = jnp.clip(src, 0, batch.num_nodes - 1)
    dst = jnp.clip(dst, 0, batch.num_nodes - 1)

    # membership test against real edges: lexsorted (sender, receiver) pairs
    N = batch.num_nodes
    order = jnp.lexsort((batch.receivers, jnp.where(batch.edge_mask,
                                                    batch.senders, N)))
    rs = jnp.where(batch.edge_mask, batch.senders, N)[order]
    rr = batch.receivers[order]

    def is_edge(s_q, r_q):
        # scan a small window (duplicates of the same sender are contiguous)
        lo = jnp.searchsorted(rs, s_q, side="left")
        hi = jnp.searchsorted(rs, s_q, side="right")
        # windowed check with a fixed cap to stay static-shape
        CAP = 64
        offs = jnp.arange(CAP)
        pos = jnp.clip(lo[..., None] + offs, 0, E - 1)
        hit = (
            (rs[pos] == s_q[..., None])
            & (rr[pos] == r_q[..., None])
            & (lo[..., None] + offs < hi[..., None])
        )
        return jnp.any(hit, axis=-1)

    collides = is_edge(src, dst)
    self_loop = src == dst
    neg_mask = batch.edge_mask & ~collides & ~self_loop
    return src, dst, neg_mask
