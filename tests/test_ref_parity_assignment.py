"""Exact-equality parity for the total-assignment propagation (VERDICT r2
#4a): the reference's ``propagate_assignments_sparse``/``get_assignments``
(tgp/utils/ops.py:1222-1441) is deterministic up to the random fallback, so
its NumPy transcription (``ref_oracle.get_assignments_deterministic``) is a
TRUE oracle — every propagation round must match EXACTLY (who gets assigned,
and to which cluster, including the max-count-then-smallest-index
tie-break and duplicate-edge vote multiplicity)."""

from __future__ import annotations

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent.parent / "scripts"))
import ref_oracle as oracle  # noqa: E402

from tests.utils_graphs import make_batch  # noqa: E402


def _kept_set(b, seed, frac=0.3):
    """Sorted kept-node ids (>=1 per graph) on the valid prefix."""
    rng = np.random.default_rng(seed)
    nm = np.asarray(b.node_mask)
    ng = np.asarray(b.node_graph)
    sel = nm & (rng.random(b.num_nodes) < frac)
    for g in range(b.num_graphs):
        idx = np.nonzero(nm & (ng == g))[0]
        if idx.size and not sel[idx].any():
            sel[idx[0]] = True
    return np.nonzero(sel)[0]  # ascending — matches reference cluster order


def _valid_edges(b):
    em = np.asarray(b.edge_mask)
    return np.stack([np.asarray(b.senders)[em], np.asarray(b.receivers)[em]])


@pytest.mark.parametrize("seed", range(5))
def test_propagation_rounds_match_reference_exactly(seed):
    from tgp_tpu.ops.assignment import propagate_assignments_step

    b = make_batch([11, 7, 14], p=0.25, seed=seed * 13, pad_nodes=48,
                   pad_edges=192)
    kept = _kept_set(b, seed)
    K = kept.size
    ei = _valid_edges(b)
    nm = np.asarray(b.node_mask)

    # mine: cluster id = position in the sorted kept list (so "smallest
    # cluster id" == the reference's "smallest 1-based kept index")
    ci = np.zeros(b.num_nodes, np.int32)
    ci[kept] = np.arange(K, dtype=np.int32)
    assigned = np.zeros(b.num_nodes, bool)
    assigned[kept] = True

    # oracle state
    o_asg = np.zeros(b.num_nodes, np.int64)
    o_asg[kept] = np.arange(1, K + 1)
    o_mask = np.zeros(b.num_nodes, bool)
    o_mask[kept] = True

    ci_j = jnp.asarray(ci)
    as_j = jnp.asarray(assigned)
    step = jax.jit(lambda c, a: propagate_assignments_step(
        c, a, b.senders, b.receivers, b.edge_mask, K))
    for rnd in range(4):
        ci_j, as_j = step(ci_j, as_j)
        o_asg, o_mask = oracle.propagate_assignments_sparse(
            o_asg, ei, kept, o_mask, K)
        got_mask = np.asarray(as_j)[nm]
        np.testing.assert_array_equal(got_mask, o_mask[nm],
                                      err_msg=f"round {rnd} mask")
        got_ci = np.asarray(ci_j)[nm]
        want_ci = (o_asg - 1)[nm]
        sel = o_mask[nm]
        np.testing.assert_array_equal(got_ci[sel], want_ci[sel],
                                      err_msg=f"round {rnd} clusters")


@pytest.mark.parametrize("impl", ["sparse", "dense"])
def test_assign_all_nodes_matches_reference_prefix(impl):
    """End-to-end ``assign_all_nodes``: every node the oracle's deterministic
    prefix assigns must carry the identical cluster; only fallback nodes may
    differ.  (Dense path requires coalesced edges — ER graphs are.)"""
    from tgp_tpu.ops.assignment import assign_all_nodes
    from tgp_tpu.select.base import cluster_to_select_output

    for seed in range(4):
        b = make_batch([13, 9, 17], p=0.3, seed=seed * 7, pad_nodes=48,
                       pad_edges=256)
        kept = _kept_set(b, seed + 50)
        K = kept.size
        nm = np.asarray(b.node_mask)
        ci = np.zeros(b.num_nodes, np.int64)
        ci[kept] = np.arange(K)
        sel = np.zeros(b.num_nodes, bool)
        sel[kept] = True
        so = cluster_to_select_output(
            jnp.asarray(ci), b, node_sel_mask=jnp.asarray(sel),
            num_clusters=K, max_clusters=b.max_nodes, partial=True)
        out = assign_all_nodes(so, b.senders, b.receivers, b.edge_mask,
                               max_iter=5, node_pos=b.node_pos,
                               max_nodes=b.max_nodes, impl=impl)
        o_asg, o_mask = oracle.get_assignments_deterministic(
            kept, _valid_edges(b), b.num_nodes, max_iter=5)
        got = np.asarray(out.cluster_index)
        prefix = o_mask & nm
        np.testing.assert_array_equal(got[prefix], (o_asg - 1)[prefix])
        # everything valid is assigned afterwards (fallback covered rest)
        assert np.asarray(out.node_sel_mask)[nm].all()


def test_duplicate_edge_votes_count_multiplicity():
    """The reference counts duplicate directed edges as separate votes
    (``torch.unique(combined, return_counts=True)`` over EDGES).  Node 2
    has one edge from cluster-0's seed and TWO parallel edges from
    cluster-1's seed → majority is cluster 1, even though tie-breaking
    alone would pick cluster 0."""
    from tgp_tpu.graph import from_graphs
    from tgp_tpu.ops.assignment import propagate_assignments_step

    x = np.ones((3, 2), np.float32)
    ei = np.array([[0, 1, 1], [2, 2, 2]])
    b = from_graphs([(x, ei)], pad_nodes=8, pad_edges=8)
    ci = jnp.asarray(np.array([0, 1, 0], np.int32).repeat(1))
    ci = jnp.concatenate([ci, jnp.zeros(5, jnp.int32)])
    assigned = jnp.concatenate([jnp.array([True, True, False]),
                                jnp.zeros(5, bool)])
    ci2, as2 = propagate_assignments_step(
        ci, assigned, b.senders, b.receivers, b.edge_mask, 2)
    assert bool(as2[2])
    assert int(ci2[2]) == 1  # majority by multiplicity, not tie-break

    # oracle agrees
    o_asg, o_mask = oracle.get_assignments_deterministic(
        np.array([0, 1]), ei, 3, max_iter=1)
    assert o_mask[2] and o_asg[2] - 1 == 1


def test_dense_engine_counts_duplicate_votes():
    """Round-4 review fix: the dense vote engine must count duplicate
    directed edges by multiplicity, matching the sparse engine (and the
    reference's per-edge vote counting) on un-coalesced multigraphs."""
    from tgp_tpu.graph import from_graphs
    from tgp_tpu.ops.assignment import assign_all_nodes
    from tgp_tpu.select.base import cluster_to_select_output

    # node 3 gets one vote from node 0 (cluster 5's seed... use 2 clusters)
    # edges: 0->3, 0->3 (duplicate), 1->3. Seeds: node0->cluster0,
    # node1->cluster1. Multiplicity majority => cluster 0... wait make the
    # duplicate favor the HIGHER cluster id so tie-break can't mask it:
    # 1->3, 1->3, 0->3: multiplicity majority = cluster of node1.
    x = np.ones((4, 2), np.float32)
    ei = np.array([[1, 1, 0], [3, 3, 3]])
    b = from_graphs([(x, ei)], pad_nodes=8, pad_edges=8)
    ci = jnp.concatenate([jnp.asarray([0, 1, 0, 0], jnp.int32),
                          jnp.zeros(4, jnp.int32)])
    sel = jnp.concatenate([jnp.asarray([True, True, False, False]),
                           jnp.zeros(4, bool)])
    so = cluster_to_select_output(ci, b, node_sel_mask=sel, num_clusters=2,
                                  max_clusters=8, partial=True)
    outs = {}
    for impl in ("sparse", "dense"):
        out = assign_all_nodes(so, b.senders, b.receivers, b.edge_mask,
                               max_iter=1, node_pos=b.node_pos,
                               max_nodes=b.max_nodes, impl=impl)
        outs[impl] = int(np.asarray(out.cluster_index)[3])
    assert outs["sparse"] == 1  # two votes from cluster 1 beat one from 0
    assert outs["dense"] == outs["sparse"]


def test_dense_impl_requires_layout():
    from tgp_tpu.graph import from_graphs
    from tgp_tpu.ops.assignment import assign_all_nodes
    from tgp_tpu.select.base import cluster_to_select_output

    x = np.ones((3, 2), np.float32)
    ei = np.array([[0, 1], [2, 2]])
    b = from_graphs([(x, ei)], pad_nodes=4, pad_edges=4)
    so = cluster_to_select_output(
        jnp.zeros(4, jnp.int32), b,
        node_sel_mask=jnp.asarray([True, False, False, False]),
        num_clusters=1, max_clusters=4, partial=True)
    with pytest.raises(ValueError, match="node_pos"):
        assign_all_nodes(so, b.senders, b.receivers, b.edge_mask,
                         impl="dense")


def test_zero_occupied_graph_keeps_nodes_unassigned():
    """A graph whose selection occupies no supernode must NOT have its
    nodes fall back to another graph's cluster (round-4 review fix)."""
    from tgp_tpu.graph import from_graphs
    from tgp_tpu.ops.assignment import assign_all_nodes
    from tgp_tpu.select.base import cluster_to_select_output

    x1 = np.ones((3, 2), np.float32)
    e1 = np.array([[0, 1], [1, 2]])
    x2 = np.ones((2, 2), np.float32)
    e2 = np.array([[0], [1]])
    b = from_graphs([(x1, e1), (x2, e2)], pad_nodes=8, pad_edges=8)
    # only graph 0 has a seed; graph 1 selects nothing
    sel = np.zeros(b.num_nodes, bool)
    sel[0] = True
    so = cluster_to_select_output(
        jnp.zeros(b.num_nodes, jnp.int32), b,
        node_sel_mask=jnp.asarray(sel), num_clusters=1, max_clusters=4,
        partial=True)
    out = assign_all_nodes(so, b.senders, b.receivers, b.edge_mask,
                           max_iter=2)
    ng = np.asarray(b.node_graph)
    nm = np.asarray(b.node_mask)
    asg = np.asarray(out.node_sel_mask)
    # graph 0's valid nodes all assigned to its own cluster 0
    assert asg[nm & (ng == 0)].all()
    # graph 1's nodes stay unassigned instead of borrowing cluster 0
    assert not asg[nm & (ng == 1)].any()


def test_sparse_connect_accepts_column_edge_weight():
    from tgp_tpu.connect.base import ConnectConfig, sparse_connect
    from tgp_tpu.graph import from_graphs
    from tgp_tpu.select.base import cluster_to_select_output

    x = np.ones((4, 2), np.float32)
    ei = np.array([[0, 1, 2, 3], [1, 0, 3, 2]])
    b = from_graphs([(x, ei)], pad_nodes=8, pad_edges=8)
    so = cluster_to_select_output(
        jnp.asarray([0, 0, 1, 1] + [0] * 4, jnp.int32), b,
        num_clusters=2, max_clusters=8)
    flat = sparse_connect(b.senders, b.receivers, b.edge_weight,
                          b.edge_mask, so, ConnectConfig())
    col = sparse_connect(b.senders, b.receivers, b.edge_weight[:, None],
                         b.edge_mask, so, ConnectConfig())
    for a, c in zip(flat, col):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
