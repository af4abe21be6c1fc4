"""k-MIS selection (reference: tgp/select/kmis_select.py:35-388; Bacciu et
al. 2023, generalizing Blelloch's parallel MIS).

TPU design: the reference's data-dependent ``while not mask.all()`` loop over
``scatter_min`` rounds maps directly onto ``lax.while_loop`` (static shapes,
traced condition).  Padded nodes start *covered* with infinite rank so they
can neither join nor block the MIS.  Supernode ids are the MIS members' own
node indices (budget ``N``), so ``cluster_graph``/``cluster_pos`` come free
from the batch metadata.
"""

from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from tgp_tpu.graph import GraphBatch
from tgp_tpu.ops.segment import segment_min, segment_sum
from tgp_tpu.ops.sparse import weighted_degree
from tgp_tpu.select.base import SelectOutput

__all__ = ["maximal_independent_set", "maximal_independent_set_dense",
           "mis_cluster", "mis_cluster_dense", "KMISSelect"]


def _khop_min(vals, senders, receivers, edge_mask, num_nodes, k):
    """k rounds of min-propagation over edges ∪ self-loops."""
    def one(vals):
        src = jnp.where(edge_mask, vals[senders], jnp.iinfo(jnp.int32).max)
        neigh = segment_min(src, receivers, num_nodes)
        return jnp.minimum(neigh, vals)

    for _ in range(k):
        vals = one(vals)
    return vals


def _khop_or(flags, senders, receivers, edge_mask, num_nodes, k):
    def one(flags):
        src = (flags[senders] & edge_mask).astype(jnp.int32)
        neigh = segment_sum(src, receivers, num_nodes) > 0
        return flags | neigh

    for _ in range(k):
        flags = one(flags)
    return flags


def maximal_independent_set(rank, senders, receivers, edge_mask, node_mask,
                            order_k: int = 1):
    """Greedy maximal k-independent set by ``rank`` (lower = first)."""
    N = rank.shape[0]
    BIG = jnp.int32(N)
    rank = jnp.where(node_mask, rank, BIG)

    def cond(state):
        mis, covered, min_rank = state
        return ~jnp.all(covered)

    def body(state):
        mis, covered, min_rank = state
        mr = _khop_min(min_rank, senders, receivers, edge_mask, N, order_k)
        mis = mis | (node_mask & (rank == mr))
        covered2 = _khop_or(mis, senders, receivers, edge_mask, N, order_k)
        covered2 = covered2 | ~node_mask | mis
        min_rank2 = jnp.where(covered2, BIG, rank)
        return mis, covered2, min_rank2

    mis0 = jnp.zeros(N, bool)
    covered0 = ~node_mask
    state = (mis0, covered0, rank)
    mis, _, _ = jax.lax.while_loop(cond, body, state)
    return mis


# -- dense (scatter-free) twin --------------------------------------------
#
# Every MIS round pays 2·order_k random scatters in the sparse loop, which
# XLA serializes over update rows on TPU.  For pooling-scale graphs
# (Nmax ≲ 2k) the whole loop runs on a per-graph dense adjacency instead:
# min-propagation = masked column-min over [B, Nm, Nm], coverage = masked
# any — elementwise/reduce passes only (same rationale as
# edge_contraction.maximal_matching_dense).

def _to_dense_min(vals, node_graph, node_pos, num_graphs, max_nodes, big):
    """Packed → dense node scatter, min-combining: padding rows alias the
    cell ``[B-1, Nm-1]`` (graph.py:228-229), so they must carry ``big`` and
    combine by min to never clobber a real node's value."""
    d = jnp.full((num_graphs, max_nodes), big, vals.dtype)
    return d.at[node_graph, node_pos].min(vals)


def _dense_bool_adj(batch):
    g = batch.node_graph[batch.senders]
    li = batch.node_pos[batch.senders]
    lj = batch.node_pos[batch.receivers]
    A = jnp.zeros((batch.num_graphs, batch.max_nodes, batch.max_nodes), bool)
    return A.at[g, li, lj].max(batch.edge_mask)


def _khop_min_dense(vals, A, k):
    """``vals [B,Nm]`` → per-node min over k-hop in-neighborhood ∪ self."""
    MAX = jnp.iinfo(jnp.int32).max
    for _ in range(k):
        neigh = jnp.where(A, vals[:, :, None], MAX).min(axis=1)
        vals = jnp.minimum(neigh, vals)
    return vals


def _khop_or_dense(flags, A, k):
    for _ in range(k):
        flags = flags | (A & flags[:, :, None]).any(axis=1)
    return flags


def maximal_independent_set_dense(rank, batch, order_k: int = 1):
    """Dense-loop twin of :func:`maximal_independent_set` (packed in/out)."""
    N = rank.shape[0]
    BIG = jnp.int32(N)
    B, Nm = batch.num_graphs, batch.max_nodes
    ng, np_, nm = batch.node_graph, batch.node_pos, batch.node_mask
    A = _dense_bool_adj(batch)
    rank_d = _to_dense_min(jnp.where(nm, rank, BIG), ng, np_, B, Nm, BIG)
    mask_d = jnp.zeros((B, Nm), bool).at[ng, np_].max(nm)

    def cond(state):
        mis, covered, min_rank = state
        return ~jnp.all(covered)

    def body(state):
        mis, covered, min_rank = state
        mr = _khop_min_dense(min_rank, A, order_k)
        mis = mis | (mask_d & (rank_d == mr))
        covered2 = _khop_or_dense(mis, A, order_k)
        covered2 = covered2 | ~mask_d | mis
        min_rank2 = jnp.where(covered2, BIG, rank_d)
        return mis, covered2, min_rank2

    state = (jnp.zeros((B, Nm), bool), ~mask_d, rank_d)
    mis_d, _, _ = jax.lax.while_loop(cond, body, state)
    return mis_d[ng, np_] & nm


def mis_cluster_dense(mis, rank, batch, order_k: int = 1):
    """Dense twin of :func:`mis_cluster` (packed in/out)."""
    N = rank.shape[0]
    BIG = jnp.int32(N)
    B, Nm = batch.num_graphs, batch.max_nodes
    ng, np_, nm = batch.node_graph, batch.node_pos, batch.node_mask
    A = _dense_bool_adj(batch)
    min_rank = jnp.where(mis & nm, rank, BIG)
    mr_d = _to_dense_min(min_rank, ng, np_, B, Nm, BIG)
    min_rank = _khop_min_dense(mr_d, A, order_k)[ng, np_]
    inv = jnp.zeros(N + 1, jnp.int32).at[jnp.clip(rank, 0, N)].set(
        jnp.arange(N, dtype=jnp.int32))
    cluster = inv[jnp.clip(min_rank, 0, N)]
    unreached = (min_rank >= BIG) & nm
    return jnp.where(unreached, jnp.arange(N, dtype=jnp.int32), cluster)


def mis_cluster(mis, rank, senders, receivers, edge_mask, node_mask,
                order_k: int = 1):
    """Assign every node to its nearest (min-rank within k hops) MIS member;
    returns ``cluster_index [N]`` = representative node index."""
    N = rank.shape[0]
    BIG = jnp.int32(N)
    min_rank = jnp.where(mis, rank, BIG)
    min_rank = _khop_min(min_rank, senders, receivers, edge_mask, N, order_k)
    # rank → node index lookup (ranks are a permutation of 0..N-1 on valid
    # nodes; pad slot N absorbs BIG)
    inv = jnp.zeros(N + 1, jnp.int32).at[jnp.clip(rank, 0, N)].set(
        jnp.arange(N, dtype=jnp.int32))
    cluster = inv[jnp.clip(min_rank, 0, N)]
    # unreached nodes (min_rank == BIG) map to themselves
    unreached = (min_rank >= BIG) & node_mask
    cluster = jnp.where(unreached, jnp.arange(N, dtype=jnp.int32), cluster)
    return cluster


class KMISSelect(nn.Module):
    """Scorer + heuristic + k-MIS clustering."""

    in_channels: Optional[int] = None
    order_k: int = 1
    scorer: str = "linear"
    score_heuristic: Optional[str] = "greedy"
    s_inv_op: str = "transpose"
    mis_impl: str = "auto"  # 'auto' | 'dense' | 'sparse'
    #: symmetrize the connectivity before the MIS (reference
    #: ``force_undirected`` → ``to_undirected(reduce="max")``,
    #: kmis_select.py:355-358); static-shape version: concat reversed
    #: edges (2E budget) + max-coalesce
    force_undirected: bool = False

    def _score(self, batch: GraphBatch) -> jax.Array:
        if self.scorer == "linear":
            return jax.nn.sigmoid(nn.Dense(1, name="lin")(batch.x)[:, 0])
        if self.scorer == "constant":
            return jnp.ones(batch.num_nodes)
        if self.scorer == "canonical":
            return -jnp.arange(batch.num_nodes, dtype=jnp.float32)
        if self.scorer == "degree":
            return weighted_degree(batch.receivers, batch.edge_weight,
                                   batch.num_nodes, mask=batch.edge_mask)
        if self.scorer == "random":
            # Reference semantics (kmis_select.py: fresh ``torch.rand`` per
            # forward): draw from the 'sample' PRNG stream when the caller
            # provides one (``model.apply(..., rngs={'sample': key})``).
            # Without a stream, fall back to a deterministic index hash so
            # un-keyed applies stay jit-safe and reproducible (documented in
            # docs/migration.md).
            if self.has_rng("sample"):
                return jax.random.uniform(self.make_rng("sample"),
                                          (batch.num_nodes,))
            return jnp.sin(jnp.arange(batch.num_nodes) * 12.9898) * 43758.5453 % 1.0
        raise ValueError(f"unknown scorer {self.scorer!r}")

    def _heuristic(self, score, batch: GraphBatch) -> jax.Array:
        if self.score_heuristic is None:
            return score
        k_sums = (jnp.ones_like(score) if self.score_heuristic == "greedy"
                  else score)
        for _ in range(self.order_k):
            src = jnp.where(batch.edge_mask, k_sums[batch.senders], 0.0)
            k_sums = k_sums + segment_sum(src, batch.receivers,
                                          batch.num_nodes)
        return score / jnp.maximum(k_sums, 1e-12)

    @nn.compact
    def __call__(self, batch: GraphBatch) -> SelectOutput:
        if self.force_undirected:
            from tgp_tpu.ops.sparse import coalesce

            s2 = jnp.concatenate([batch.senders, batch.receivers])
            r2 = jnp.concatenate([batch.receivers, batch.senders])
            w2 = jnp.concatenate([batch.edge_weight, batch.edge_weight])
            em2 = jnp.concatenate([batch.edge_mask, batch.edge_mask])
            s2, r2, w2, em2 = coalesce(s2, r2, w2, em2, batch.num_nodes,
                                       reduce="max")
            batch = batch.replace(senders=s2, receivers=r2, edge_weight=w2,
                                  edge_mask=em2)
        score = self._score(batch)
        updated = self._heuristic(score, batch)
        # rank by descending updated score; padded nodes last
        order = jnp.lexsort((-updated, ~batch.node_mask))
        rank = jnp.zeros(batch.num_nodes, jnp.int32).at[order].set(
            jnp.arange(batch.num_nodes, dtype=jnp.int32))
        impl = self.mis_impl
        if impl == "auto":
            from tgp_tpu.ops.sparse import use_dense_vote
            impl = ("dense" if use_dense_vote(
                batch.num_graphs, batch.max_nodes) else "sparse")
        if impl == "dense":
            mis = maximal_independent_set_dense(rank, batch, self.order_k)
            cluster = mis_cluster_dense(mis, rank, batch, self.order_k)
        else:
            mis = maximal_independent_set(
                rank, batch.senders, batch.receivers, batch.edge_mask,
                batch.node_mask, self.order_k)
            cluster = mis_cluster(
                mis, rank, batch.senders, batch.receivers, batch.edge_mask,
                batch.node_mask, self.order_k)
        return SelectOutput(
            cluster_index=cluster,
            weight=jnp.where(batch.node_mask, score, 0.0),
            node_sel_mask=batch.node_mask,
            node_graph=batch.node_graph,
            node_mask=batch.node_mask,
            cluster_graph=batch.node_graph,
            cluster_pos=batch.node_pos,
            num_clusters=batch.num_nodes,
            num_graphs=batch.num_graphs,
            max_clusters=batch.max_nodes,
            partial=False,
            s_inv_op=self.s_inv_op,
            extras={"mis": mis},
        )
