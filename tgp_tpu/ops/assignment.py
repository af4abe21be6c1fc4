"""Total-assignment machinery: upgrade a partial (top-k style) selection to a
full node→supernode assignment by BFS-style majority-vote propagation with a
fallback for disconnected remainders.

TPU re-design of the reference's ``propagate_assignments_sparse`` /
``get_assignments`` (tgp/utils/ops.py:1222-1441): the reference's
sort + ``unique`` vote counting becomes a fixed-shape double lexsort
(run-length counting, then best-run selection per destination), unrolled
``max_iter`` times under ``jit``.  The reference's *random* fallback for
still-unassigned nodes is replaced by a deterministic "first supernode of the
same graph" fallback (or seeded pseudo-random with ``key``) — randomness
inside jit would thread PRNG keys through every pooler for a path that only
triggers on disconnected leftovers.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from tgp_tpu.ops.segment import segment_min, segment_sum

__all__ = ["propagate_assignments_step", "assign_all_nodes"]


def propagate_assignments_step(cluster_index, assigned, senders, receivers,
                               edge_mask, num_clusters: int):
    """One propagation round: every unassigned node adopts the majority
    cluster among its *assigned* in-neighbors (ties → smallest cluster id).

    Returns updated ``(cluster_index, assigned)``.
    """
    E = senders.shape[0]
    N = cluster_index.shape[0]
    votes_valid = edge_mask & assigned[senders] & ~assigned[receivers]
    dst = jnp.where(votes_valid, receivers, N)  # invalid → sentinel N
    c_vote = jnp.where(votes_valid, cluster_index[senders], num_clusters)

    # 1) group identical (dst, cluster) votes: sort then run-length count
    order = jnp.lexsort((c_vote, dst))
    d_s, c_s = dst[order], c_vote[order]
    is_head = jnp.concatenate(
        [jnp.ones(1, bool), (d_s[1:] != d_s[:-1]) | (c_s[1:] != c_s[:-1])]
    )
    run_id = jnp.cumsum(is_head.astype(jnp.int32)) - 1
    run_count = segment_sum(jnp.ones(E, jnp.int32), run_id, E)
    cnt = run_count[run_id]

    # 2) among runs of the same dst pick (max count, then smallest cluster):
    #    rank run-heads by (-count, cluster) within dst
    head_valid = is_head & (d_s < N)
    order2 = jnp.lexsort((c_s, -cnt, ~head_valid, d_s))
    d2 = d_s[order2]
    c2 = c_s[order2]
    v2 = head_valid[order2]
    best = jnp.concatenate([jnp.ones(1, bool), d2[1:] != d2[:-1]]) & v2

    new_cluster = cluster_index
    new_assigned = assigned
    upd_dst = jnp.where(best, d2, N)
    upd_c = jnp.where(best, c2, 0)
    # scatter updates (sentinel N row is dropped via padding trick)
    pad_cluster = jnp.concatenate([new_cluster, jnp.zeros(1, new_cluster.dtype)])
    pad_assigned = jnp.concatenate([new_assigned, jnp.zeros(1, bool)])
    pad_cluster = pad_cluster.at[upd_dst].set(upd_c.astype(new_cluster.dtype))
    pad_assigned = pad_assigned.at[upd_dst].set(best)
    # merge: only previously-unassigned nodes change
    changed = pad_assigned[:N] & ~assigned
    new_cluster = jnp.where(changed, pad_cluster[:N], cluster_index)
    new_assigned = assigned | changed
    return new_cluster, new_assigned


def _propagate_assignments_dense(so, senders, receivers, edge_mask, node_pos,
                                 max_nodes: int, max_iter: int):
    """``max_iter`` majority-vote rounds in per-graph dense layout.

    The sparse step pays two ``E``-length lexsorts plus scatters per round;
    here vote counting is ONE batched one-hot matmul on the MXU —
    ``counts[b,j,c] = Σ_i mult[b,i,j]·onehot(cluster)[b,i,c]`` — and the
    argmax over ``c`` reproduces the (max count, then smallest cluster id)
    tie-break exactly, because clusters are indexed by their per-graph
    ascending-global-id rank.  Same semantics, zero scatters per round.
    ``mult`` accumulates duplicate directed edges (multiplicity), so
    multigraph inputs vote identically to the sparse engine.

    Returns the updated packed ``(cluster_index, assigned)``.
    """
    from tgp_tpu.ops.segment import segment_topk_rank

    C = so.num_clusters
    B, Nm, Km = so.num_graphs, max_nodes, so.max_clusters
    ng = so.node_graph

    # cluster ↔ per-graph ascending-global-id rank (the tie-break order)
    c_rank = segment_topk_rank(-jnp.arange(C, dtype=jnp.float32),
                               so.cluster_graph, B)
    c_rank = jnp.clip(c_rank, 0, Km - 1)
    table = jnp.full((B, Km), 0, jnp.int32).at[so.cluster_graph, c_rank].max(
        jnp.arange(C, dtype=jnp.int32))

    g_e = ng[senders]
    # edge multiplicity, not a bool adjacency: duplicate directed edges each
    # carry a vote, matching propagate_assignments_step (and the reference's
    # per-edge scatter vote, ops.py:1222-1314) on un-coalesced input
    A = jnp.zeros((B, Nm, Nm), jnp.float32).at[
        g_e, node_pos[senders], node_pos[receivers]].add(
            edge_mask.astype(jnp.float32))
    # padding rows alias cell [B-1, Nm-1] (graph.py:228-229): they carry
    # False/0 and add zero, never clobbering a real node
    asg_d = jnp.zeros((B, Nm), bool).at[ng, node_pos].max(so.node_sel_mask)
    cl0 = jnp.where(so.node_sel_mask,
                    c_rank[jnp.clip(so.cluster_index, 0, C - 1)], 0)
    cl_d = jnp.zeros((B, Nm), jnp.int32).at[ng, node_pos].max(cl0)

    for _ in range(max_iter):
        valid = (A * asg_d[:, :, None] *
                 (~asg_d)[:, None, :])  # votes: assigned i → unassigned j
        oh = jax.nn.one_hot(cl_d, Km, dtype=jnp.float32) * asg_d[..., None]
        counts = jnp.einsum("bij,bic->bjc", valid, oh)
        best_c = jnp.argmax(counts, axis=-1).astype(jnp.int32)
        has_vote = counts.max(axis=-1) > 0
        changed = has_vote & ~asg_d
        cl_d = jnp.where(changed, best_c, cl_d)
        asg_d = asg_d | changed

    new_assigned = asg_d[ng, node_pos] & so.node_mask
    global_c = table[ng, jnp.clip(cl_d[ng, node_pos], 0, Km - 1)]
    changed = new_assigned & ~so.node_sel_mask
    cluster_index = jnp.where(changed, global_c, so.cluster_index)
    return cluster_index, so.node_sel_mask | changed


def assign_all_nodes(so, senders, receivers, edge_mask, *,
                     max_iter: int = 5, weight: Optional[jax.Array] = None,
                     key: Optional[jax.Array] = None,
                     node_pos: Optional[jax.Array] = None,
                     max_nodes: Optional[int] = None,
                     impl: str = "auto"):
    """Upgrade a partial :class:`~tgp_tpu.select.SelectOutput` to a total
    assignment (reference: ``SelectOutput.assign_all_nodes``,
    tgp/select/base_select.py:381-486).

    Propagates ``max_iter`` rounds, then assigns any remaining valid node
    within its own graph: to a *uniformly random occupied supernode* when
    ``key`` is given (the reference's ``get_random_map_mask`` batch-
    respecting semantics, tgp/utils/ops.py:1177-1219), else to the first
    (lowest-id) occupied supernode (deterministic default — reproducible
    under jit without an rng plumb-through).  A graph whose selection
    occupies *no* supernode keeps its nodes unassigned (masked out) rather
    than borrowing a cluster from another graph.  ``weight`` replaces the
    per-node assignment weight; ``None`` resets to ones for every assigned
    node — reference semantics (base_select.py:476-481 rebuilds the
    SelectOutput with ``weight=weight``), so pass ``so.weight`` (as MaxCut
    does with its scores) to preserve score gates.

    ``impl`` picks the propagation engine: ``'sparse'`` = per-round lexsort
    voting; ``'dense'`` = batched one-hot matmul voting (needs ``node_pos`` +
    ``max_nodes`` and coalesced edges); ``'auto'`` = dense when the layout is
    given and ``B·Nmax²`` fits the dense budget.
    """
    if impl == "dense" and (node_pos is None or max_nodes is None):
        raise ValueError(
            "impl='dense' needs node_pos and max_nodes (the per-graph "
            "dense layout); pass them or use impl='sparse'/'auto'")
    use_dense = False
    if node_pos is not None and max_nodes is not None and impl != "sparse":
        from tgp_tpu.ops.sparse import use_dense_vote

        use_dense = impl == "dense" or use_dense_vote(
            so.num_graphs, max_nodes)
    if use_dense:
        cluster_index, assigned = _propagate_assignments_dense(
            so, senders, receivers, edge_mask, node_pos, max_nodes, max_iter)
    else:
        cluster_index = so.cluster_index
        assigned = so.node_sel_mask
        for _ in range(max_iter):
            cluster_index, assigned = propagate_assignments_step(
                cluster_index, assigned, senders, receivers, edge_mask,
                so.num_clusters)

    occupied = segment_sum(
        jnp.ones_like(cluster_index), cluster_index, so.num_clusters,
        mask=assigned) > 0
    C = so.num_clusters
    # a graph with zero occupied supernodes has nowhere in-graph to fall
    # back to — leave its nodes unassigned rather than cross-graph
    occ_per_graph = segment_sum(
        jnp.ones(C, jnp.int32), so.cluster_graph, so.num_graphs,
        mask=occupied) > 0
    remaining = so.node_mask & ~assigned & occ_per_graph[so.node_graph]
    if key is not None:
        # reference-equivalent random fallback: uniform over the graph's
        # occupied supernodes.  table[g, j] = id of the graph's j-th
        # occupied supernode (rank by ascending id, like the reference's
        # cumsum-offset indexing of batch-sorted kept nodes)
        from tgp_tpu.ops.segment import segment_topk_rank

        rank = segment_topk_rank(
            -jnp.arange(C, dtype=jnp.float32), so.cluster_graph,
            so.num_graphs, mask=occupied)
        counts = segment_sum(jnp.ones(C, jnp.int32), so.cluster_graph,
                             so.num_graphs, mask=occupied)
        Kmax = so.max_clusters
        table = jnp.zeros((so.num_graphs, Kmax), jnp.int32).at[
            so.cluster_graph, jnp.clip(rank, 0, Kmax - 1)].max(
                jnp.where(occupied, jnp.arange(C, dtype=jnp.int32), 0))
        u = jax.random.uniform(key, cluster_index.shape)
        n_g = jnp.maximum(counts[so.node_graph], 1)
        j = jnp.floor(u * n_g).astype(jnp.int32)
        fallback = table[so.node_graph, jnp.clip(j, 0, Kmax - 1)]
    else:
        first_in_graph = segment_min(
            jnp.arange(C, dtype=jnp.int32), so.cluster_graph, so.num_graphs,
            mask=occupied)
        first_in_graph = jnp.clip(first_in_graph, 0, C - 1)
        fallback = first_in_graph[so.node_graph]
    cluster_index = jnp.where(remaining, fallback, cluster_index)
    assigned = assigned | remaining

    w = weight if weight is not None else jnp.ones_like(so.weight)
    w = jnp.where(assigned & so.node_mask, w, 0.0)
    return so.replace(
        cluster_index=cluster_index.astype(jnp.int32),
        node_sel_mask=assigned & so.node_mask,
        weight=w,
        partial=False,
    )
