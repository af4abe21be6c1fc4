"""SEP coding-tree property tests (reference behavioral model:
tests/selection/test_sep_select.py's PartitionTree invariants — tree
validity, height bounds, entropy monotonicity, partition quality — ported
as properties rather than heap-internals checks, since our agglomeration
is an independent implementation)."""

import numpy as np
import pytest

from tests.utils_graphs import erdos_renyi_graph
from tgp_tpu.precoarsen.sep import sep_coding_tree, sep_levels


def two_cliques(n_per=6, bridge=False, seed=0):
    rng = np.random.default_rng(seed)
    n = 2 * n_per
    adj = np.zeros((n, n))
    adj[:n_per, :n_per] = 1.0
    adj[n_per:, n_per:] = 1.0
    np.fill_diagonal(adj, 0.0)
    if bridge:
        adj[0, n_per] = adj[n_per, 0] = 1.0
    s, r = np.nonzero(adj)
    return np.stack([s, r]).astype(np.int64), n


def tree_entropy(nodes, root):
    """H(T) = −Σ_{n≠root} (cut_n/V) log2(vol_n/vol_parent)."""
    V = nodes[root].vol
    H = 0.0
    for nid, n in nodes.items():
        if nid == root or n.parent is None:
            continue
        p = nodes[n.parent]
        if n.vol > 0 and p.vol > 0:
            H += -(n.cut / V) * np.log2(max(n.vol / p.vol, 1e-12))
    return H


def check_tree_valid(nodes, root, num_nodes):
    # every leaf reachable from root, exactly once
    assert sorted(nodes[root].leaves) == list(range(num_nodes))
    for nid, n in nodes.items():
        for c in n.children:
            assert nodes[c].parent == nid, (nid, c)
        if n.children:
            child_leaves = sorted(
                leaf for c in n.children for leaf in nodes[c].leaves)
            assert child_leaves == sorted(n.leaves), nid


def height(nodes, root):
    n = nodes[root]
    if not n.children:
        return 0
    return 1 + max(height(nodes, c) for c in n.children)


@pytest.mark.parametrize("use_native", [False, True])
def test_tree_validity_er(use_native):
    x, ei = erdos_renyi_graph(20, p=0.3, seed=1)
    nodes, root = sep_coding_tree(ei, 20, use_native=use_native)
    check_tree_valid(nodes, root, 20)


@pytest.mark.parametrize("max_height", [2, 3, 4])
def test_height_bound(max_height):
    x, ei = erdos_renyi_graph(24, p=0.25, seed=2)
    nodes, root = sep_coding_tree(ei, 24, max_height=max_height,
                                  use_native=False)
    assert height(nodes, root) <= max_height


def test_entropy_beats_flat_tree():
    """The built tree's structural entropy must not exceed the flat
    root→leaves encoding (the merge phase only accepts entropy decreases)."""
    x, ei = erdos_renyi_graph(20, p=0.3, seed=3)
    nodes, root = sep_coding_tree(ei, 20, max_height=4, use_native=False)
    H_tree = tree_entropy(nodes, root)
    # flat encoding entropy: every leaf hangs off the root
    deg = np.zeros(20)
    np.add.at(deg, ei[0], 1.0)
    V = deg.sum()
    H_flat = float((-(deg / V) * np.log2(np.maximum(deg / V, 1e-12))).sum())
    assert H_tree <= H_flat + 1e-9


def test_vol_conservation():
    x, ei = erdos_renyi_graph(16, p=0.3, seed=4)
    nodes, root = sep_coding_tree(ei, 16, use_native=False)
    for nid, n in nodes.items():
        if n.children:
            np.testing.assert_allclose(
                n.vol, sum(nodes[c].vol for c in n.children), rtol=1e-9)


def test_disconnected_cliques_separate():
    """Top partition must not mix the two components."""
    ei, n = two_cliques(6, bridge=False)
    parts = sep_levels(ei, n, levels=1)
    assign = np.asarray(parts[0]["cluster_index"])
    left = set(assign[:6].tolist())
    right = set(assign[6:].tolist())
    assert left.isdisjoint(right)


def test_barbell_splits_at_bridge():
    ei, n = two_cliques(6, bridge=True)
    nodes, root = sep_coding_tree(ei, n, max_height=2, use_native=False)
    top = nodes[root].children
    # some top-level split exists and at least one top cluster is pure
    assert len(top) >= 2
    sides = [set(np.asarray(nodes[c].leaves) // 6) for c in top]
    assert any(len(s) == 1 for s in sides)


def test_edge_weights_drive_merges():
    """A strongly-coupled pair must share a cluster before a weak pair."""
    # triangle chain: 0-1 heavy, 1-2 light
    ei = np.array([[0, 1, 1, 2, 0, 2], [1, 0, 2, 1, 2, 0]])
    w = np.array([10.0, 10.0, 0.1, 0.1, 0.1, 0.1], np.float32)
    nodes, root = sep_coding_tree(ei, 3, edge_weight=w, use_native=False)
    # find the first internal merge containing node 0
    for nid, n in nodes.items():
        if n.children and set(n.leaves) == {0, 1}:
            break
    else:
        pytest.fail("heavy pair (0,1) never merged into its own cluster")


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_native_matches_python_entropy(seed):
    """The C++ merge phase implements the same objective: the resulting
    entropies agree to tolerance (tie-breaking may differ)."""
    x, ei = erdos_renyi_graph(18, p=0.3, seed=seed)
    try:
        nodes_n, root_n = sep_coding_tree(ei, 18, use_native=True)
    except Exception:
        pytest.skip("native lib unavailable")
    nodes_p, root_p = sep_coding_tree(ei, 18, use_native=False)
    check_tree_valid(nodes_n, root_n, 18)
    H_n = tree_entropy(nodes_n, root_n)
    H_p = tree_entropy(nodes_p, root_p)
    np.testing.assert_allclose(H_n, H_p, rtol=0.05)


def test_levels_are_nested():
    """Multi-level partitions from one tree are hierarchically consistent:
    nodes sharing a cluster at level 0 share one at level 1 (each level's
    cluster_index maps the PREVIOUS level's clusters)."""
    x, ei = erdos_renyi_graph(24, p=0.25, seed=5)
    parts = sep_levels(ei, 24, levels=2)
    assert len(parts) == 2
    a0 = np.asarray(parts[0]["cluster_index"])          # node -> cluster
    a1 = np.asarray(parts[1]["cluster_index"])          # cluster -> super
    assert a0.shape == (24,)
    assert a1.shape == (parts[0]["num_clusters"],)
    # composing gives a valid coarser node partition
    composed = a1[a0]
    assert composed.min() >= 0
    assert composed.max() < parts[1]["num_clusters"]
    # coarser level has no more clusters than the finer one
    assert parts[1]["num_clusters"] <= parts[0]["num_clusters"]
    # pooled edge lists reference valid clusters with no self-loops
    for lvl in parts:
        ei_p = lvl["edge_index"]
        if ei_p.shape[1]:
            assert ei_p.max() < lvl["num_clusters"]
            assert (ei_p[0] != ei_p[1]).all()
