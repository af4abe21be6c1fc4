"""Negative edge sampling under static shapes (for BNPool's sparse
reconstruction loss).

Reference: ``negative_edge_sampling`` / ``batched_negative_edge_sampling``
(tgp/utils/ops.py:636-859) draw a *dynamic* number of non-edges per graph
with rejection sampling.  TPU design: draw exactly one candidate negative
pair per positive-edge slot (so ``E_neg = E`` statically, preserving the
per-graph edge distribution), sampling both endpoints uniformly from the
edge's own graph, then run a **fixed number of rejection-resampling rounds**
(static shape, default 3): candidates that collide with a real edge or a
self-loop are redrawn with a fresh key; whatever still collides after the
last round is masked out.  The membership test is exact (sorted int32
``s·N + r`` keys) for ``N ≤ 46340``; beyond that it falls back to a
degree-windowed test with a 256-edge cap per sender.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from tgp_tpu.graph import GraphBatch

__all__ = ["negative_edge_sampling", "bipartite_negative_edge_sampling",
           "cap_samples_per_graph"]

_EXACT_KEY_MAX_N = 46340  # floor(sqrt(2^31 - 1)): s·N + r fits in int32


def _edge_key_table(senders, receivers, edge_mask, num_nodes: int):
    """Sorted int32 keys of the real edges (invalid → int32 max)."""
    key = jnp.where(edge_mask,
                    senders.astype(jnp.int32) * num_nodes
                    + receivers.astype(jnp.int32),
                    jnp.iinfo(jnp.int32).max)
    return jnp.sort(key)


def _is_edge_exact(table, s_q, r_q, num_nodes: int):
    q = s_q.astype(jnp.int32) * num_nodes + r_q.astype(jnp.int32)
    idx = jnp.clip(jnp.searchsorted(table, q), 0, table.shape[0] - 1)
    return table[idx] == q


def _is_edge_windowed(senders, receivers, edge_mask, num_nodes, s_q, r_q,
                      cap: int = 256):
    """Fallback membership test for huge graphs: binary search the sender
    run, scan up to ``cap`` edges (senders with larger degree may produce
    false negatives — documented approximation)."""
    E = senders.shape[0]
    order = jnp.lexsort((receivers, jnp.where(edge_mask, senders, num_nodes)))
    rs = jnp.where(edge_mask, senders, num_nodes)[order]
    rr = receivers[order]
    lo = jnp.searchsorted(rs, s_q, side="left")
    hi = jnp.searchsorted(rs, s_q, side="right")
    offs = jnp.arange(cap)
    pos = jnp.clip(lo[..., None] + offs, 0, E - 1)
    hit = ((rs[pos] == s_q[..., None]) & (rr[pos] == r_q[..., None])
           & (lo[..., None] + offs < hi[..., None]))
    return jnp.any(hit, axis=-1)


def negative_edge_sampling(
    key: jax.Array,
    batch: GraphBatch,
    *,
    num_rounds: int = 3,
    force_undirected: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns ``(neg_senders, neg_receivers, neg_mask)``, each ``[E]``.

    Requires the collator's packed layout (valid nodes contiguous per graph,
    padding trailing) so per-graph uniform node sampling is
    ``start[g] + floor(u · n_g)``.  ``num_rounds`` rejection-resampling
    rounds keep the shape static while matching the reference's resampling
    semantics (tgp/utils/ops.py:636-765) to within a vanishing residual
    (collision probability ≈ density^num_rounds).
    """
    E = batch.num_edges
    N = batch.num_nodes
    n_g = batch.nodes_per_graph()  # [B]
    start = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(n_g)[:-1].astype(jnp.int32)])
    eg = batch.edge_graph  # [E]
    n_e = jnp.maximum(n_g[eg], 1)

    exact = N <= _EXACT_KEY_MAX_N
    if exact:
        table = _edge_key_table(batch.senders, batch.receivers,
                                batch.edge_mask, N)

        def collides(s, r):
            hit = _is_edge_exact(table, s, r, N)
            if force_undirected:
                hit = hit | _is_edge_exact(table, r, s, N)
            return hit
    else:
        def collides(s, r):
            hit = _is_edge_windowed(batch.senders, batch.receivers,
                                    batch.edge_mask, N, s, r)
            if force_undirected:
                hit = hit | _is_edge_windowed(
                    batch.senders, batch.receivers, batch.edge_mask, N, r, s)
            return hit

    def draw(k):
        k1, k2 = jax.random.split(k)
        u1 = jax.random.uniform(k1, (E,))
        u2 = jax.random.uniform(k2, (E,))
        s = start[eg] + jnp.floor(u1 * n_e).astype(jnp.int32)
        r = start[eg] + jnp.floor(u2 * n_e).astype(jnp.int32)
        return (jnp.clip(s, 0, N - 1), jnp.clip(r, 0, N - 1))

    keys = jax.random.split(key, num_rounds)
    src, dst = draw(keys[0])
    bad = collides(src, dst) | (src == dst)
    for i in range(1, num_rounds):
        s2, r2 = draw(keys[i])
        src = jnp.where(bad, s2, src)
        dst = jnp.where(bad, r2, dst)
        bad = bad & (collides(src, dst) | (src == dst))
    neg_mask = batch.edge_mask & ~bad
    return src, dst, neg_mask


def bipartite_negative_edge_sampling(
    key: jax.Array,
    senders: jax.Array,
    receivers: jax.Array,
    edge_mask: jax.Array,
    num_src: int,
    num_dst: int,
    *,
    num_samples: Optional[int] = None,
    num_rounds: int = 3,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Bipartite variant (reference: ``negative_edge_sampling`` with
    ``num_nodes=(num_src, num_dst)``, tgp/utils/ops.py:652-660): sample
    ``num_samples`` (default E) pairs uniformly over ``[0, num_src) ×
    [0, num_dst)``, rejection-resample collisions with real edges.  Self
    loops are NOT excluded (the two node sets are distinct)."""
    E = senders.shape[0]
    S = num_samples if num_samples is not None else E
    if num_src * num_dst <= jnp.iinfo(jnp.int32).max:
        key_table = jnp.sort(jnp.where(
            edge_mask,
            senders.astype(jnp.int32) * num_dst
            + receivers.astype(jnp.int32),
            jnp.iinfo(jnp.int32).max))

        def collides(s, r):
            q = s * num_dst + r
            idx = jnp.clip(jnp.searchsorted(key_table, q), 0, E - 1)
            return key_table[idx] == q
    else:
        # s·num_dst + r would overflow int32 → degree-windowed membership
        # test, same fallback as the unipartite sampler past 46340 nodes
        def collides(s, r):
            return _is_edge_windowed(senders, receivers, edge_mask,
                                     num_src, s, r)

    def draw(k):
        k1, k2 = jax.random.split(k)
        s = jax.random.randint(k1, (S,), 0, num_src)
        r = jax.random.randint(k2, (S,), 0, num_dst)
        return s, r

    keys = jax.random.split(key, num_rounds)
    src, dst = draw(keys[0])
    bad = collides(src, dst)
    for i in range(1, num_rounds):
        s2, r2 = draw(keys[i])
        src = jnp.where(bad, s2, src)
        dst = jnp.where(bad, r2, dst)
        bad = bad & collides(src, dst)
    return src, dst, ~bad


def cap_samples_per_graph(sample_mask, sample_graph, num_graphs: int,
                          cap: int):
    """Keep at most ``cap`` valid samples per graph (static shape): the
    reference's ``num_neg_samples`` per-graph cap
    (tgp/poolers/bnpool.py:135-139).  Keeps the first valid occurrences in
    slot order."""
    from tgp_tpu.ops.segment import segment_topk_rank

    n = sample_mask.shape[0]
    pos = segment_topk_rank(-jnp.arange(n, dtype=jnp.float32),
                            sample_graph, num_graphs, mask=sample_mask)
    return sample_mask & (pos < cap)
