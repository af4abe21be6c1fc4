"""Edge-contraction selection (reference:
tgp/select/edge_contraction_select.py:14-249; Diehl 2019 / Landolfi 2022).

Learnable edge score ``lin([x_i ‖ x_j])`` (softmax/tanh/sigmoid normalized),
then a greedy **maximal matching** in score order (Blelloch) — matched edges
become 2-node clusters, unmatched nodes singletons.  The reference's
sentinel-based ``while mask.any()`` scatter-min loop maps onto
``lax.while_loop``.
"""

from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from tgp_tpu.graph import GraphBatch
from tgp_tpu.ops.segment import segment_min, segment_softmax, segment_sum
from tgp_tpu.select.base import SelectOutput

__all__ = ["maximal_matching", "maximal_matching_dense", "matching",
           "EdgeContractionSelect"]

from tgp_tpu.ops.sparse import use_dense_vote


def matching(rank, batch: GraphBatch, impl: str = "auto"):
    """Dispatch greedy maximal matching: ``'dense'`` (scatter-free
    ``[B,Nmax,Nmax]`` loop — ~3× faster at pooling scales), ``'sparse'``
    (COO scatter loop, for huge graphs), or ``'auto'`` by memory budget
    (:func:`~tgp_tpu.ops.sparse.use_dense_vote`)."""
    if impl == "auto":
        impl = ("dense" if use_dense_vote(batch.num_graphs, batch.max_nodes)
                else "sparse")
    if impl == "dense":
        return maximal_matching_dense(
            rank, batch.senders, batch.receivers, batch.edge_mask,
            batch.node_graph, batch.node_pos, batch.num_graphs,
            batch.max_nodes)
    if impl == "sparse":
        return maximal_matching(rank, batch.senders, batch.receivers,
                                batch.edge_mask, batch.num_nodes)
    raise ValueError(f"unknown matching impl {impl!r}")


def maximal_matching(rank, senders, receivers, edge_mask, num_nodes: int):
    """Greedy maximal matching by edge ``rank`` (lower = first).
    Returns a bool ``[E]`` mask of matched edges.

    Pure-sparse variant: every round pays two random scatters over ``2E``
    update rows, which XLA serializes on TPU (~10 ns/row — pre-sorting the
    loop-invariant indices and using ``indices_are_sorted=True`` was
    measured *slower*, the per-round re-gather eats the win; scripts/
    exp_sorted_segment.py).  For small per-graph node counts prefer
    :func:`maximal_matching_dense` (zero scatters per round)."""
    E = rank.shape[0]
    BIG = jnp.int32(E + 1)

    def cond(state):
        match, active = state
        return jnp.any(active)

    def body(state):
        match, active = state
        r_act = jnp.where(active, rank, BIG)
        both_idx = jnp.concatenate([senders, receivers])
        both_rank = jnp.concatenate([r_act, r_act])
        node_min = segment_min(both_rank, both_idx, num_nodes)
        edge_min = jnp.minimum(node_min[senders], node_min[receivers])
        new_match = match | (active & (rank == edge_min))
        matched_node = segment_sum(
            jnp.concatenate([new_match, new_match]).astype(jnp.int32),
            both_idx, num_nodes) > 0
        active2 = active & ~matched_node[senders] & ~matched_node[receivers]
        return new_match, active2

    match0 = jnp.zeros(E, bool)
    match, _ = jax.lax.while_loop(cond, body, (match0, edge_mask))
    return match


def maximal_matching_dense(rank, senders, receivers, edge_mask, node_graph,
                           node_pos, num_graphs: int, max_nodes: int):
    """Scatter-free maximal matching on the per-graph dense rank matrix.

    Identical greedy-Blelloch semantics to :func:`maximal_matching`, but the
    loop state lives in a ``[B, Nmax, Nmax]`` dense tensor: per-round
    node-min is a pair of row/column min-reductions and "matched" is a pair
    of ``any`` reductions — all VPU-friendly elementwise/reduce passes, no
    scatters.  One ``.at[].min`` scatter builds the rank matrix outside the
    loop, one gather reads the result back per edge.  ~B·Nmax² memory; use
    for ``Nmax ≲ 2k`` (same regime as models/fast_dense.py).
    """
    E = rank.shape[0]
    BIG = jnp.int32(E + 1)
    g = node_graph[senders]
    li = node_pos[senders]
    lj = node_pos[receivers]
    r_e = jnp.where(edge_mask, rank, BIG)
    D0 = jnp.full((num_graphs, max_nodes, max_nodes), BIG, jnp.int32)
    D0 = D0.at[g, li, lj].min(r_e)  # duplicate directed edges coalesce by min
    active0 = D0 < BIG

    def cond(state):
        match_D, active_D = state
        return jnp.any(active_D)

    def body(state):
        match_D, active_D = state
        Da = jnp.where(active_D, D0, BIG)
        node_min = jnp.minimum(Da.min(axis=2), Da.min(axis=1))  # [B, Nm]
        edge_min = jnp.minimum(node_min[:, :, None], node_min[:, None, :])
        new_match = match_D | (active_D & (D0 == edge_min))
        matched = new_match.any(axis=2) | new_match.any(axis=1)  # [B, Nm]
        active2 = active_D & ~matched[:, :, None] & ~matched[:, None, :]
        return new_match, active2

    match0 = jnp.zeros_like(active0)
    match_D, _ = jax.lax.while_loop(cond, body, (match0, active0))
    # back to per-edge: the cell is matched AND this directed edge holds the
    # cell's (min) rank — excludes coalesced duplicate losers
    return match_D[g, li, lj] & edge_mask & (D0[g, li, lj] == r_e)


class EdgeContractionSelect(nn.Module):
    in_channels: int = 0
    edge_score_method: str = "softmax"  # 'softmax' | 'tanh' | 'sigmoid'
    dropout: float = 0.0
    add_to_edge_score: float = 0.5
    s_inv_op: str = "transpose"
    matching_impl: str = "auto"  # 'auto' | 'dense' | 'sparse'

    @nn.compact
    def __call__(self, batch: GraphBatch,
                 deterministic: bool = True) -> SelectOutput:
        N, E = batch.num_nodes, batch.num_edges
        if self.in_channels and batch.x.shape[-1] != self.in_channels:
            raise ValueError(
                f"EdgeContractionSelect: in_channels={self.in_channels} but "
                f"features have width {batch.x.shape[-1]} (the edge scorer "
                "infers its width, so in_channels is a declared contract — "
                "pass 0 to skip the check)")
        s, r, em = batch.senders, batch.receivers, batch.edge_mask
        e = jnp.concatenate([batch.x[s], batch.x[r]], axis=-1)
        e = nn.Dense(1, name="lin")(e)[:, 0]
        if self.dropout > 0 and not deterministic:
            e = nn.Dropout(self.dropout, deterministic=deterministic)(e)
        if self.edge_score_method == "softmax":
            e = segment_softmax(e, r, N, mask=em)
        elif self.edge_score_method == "tanh":
            e = jnp.tanh(e)
        elif self.edge_score_method == "sigmoid":
            e = jax.nn.sigmoid(e)
        else:
            raise ValueError(self.edge_score_method)
        e = e + self.add_to_edge_score

        order = jnp.lexsort((-e, ~em))
        rank = jnp.zeros(E, jnp.int32).at[order].set(
            jnp.arange(E, dtype=jnp.int32))
        match = matching(rank, batch, self.matching_impl)

        # cluster root: every node → itself; matched receivers → their sender
        cluster = jnp.arange(N, dtype=jnp.int32)
        upd_idx = jnp.where(match, r, N)  # sentinel row
        upd_val = jnp.where(match, s, 0)
        cluster = jnp.concatenate([cluster, jnp.zeros(1, jnp.int32)]).at[
            upd_idx].set(upd_val.astype(jnp.int32))[:N]

        # per-cluster weight: matched clusters get their edge score, else 1
        w_cluster = jnp.ones(N, e.dtype)
        root_idx = jnp.where(match, cluster[jnp.where(match, r, 0)], N)
        w_cluster = jnp.concatenate([w_cluster, jnp.zeros(1, e.dtype)]).at[
            root_idx].set(jnp.where(match, e, 0.0))[:N]
        weight = w_cluster[cluster]

        return SelectOutput(
            cluster_index=cluster,
            weight=jnp.where(batch.node_mask, weight, 0.0),
            node_sel_mask=batch.node_mask,
            node_graph=batch.node_graph,
            node_mask=batch.node_mask,
            cluster_graph=batch.node_graph,
            cluster_pos=batch.node_pos,
            num_clusters=N,
            num_graphs=batch.num_graphs,
            max_clusters=batch.max_nodes,
            partial=False,
            s_inv_op=self.s_inv_op,
        )
