"""Native C++ kernel tests (build + parity with NumPy fallbacks)."""

import numpy as np
import pytest

from tests.utils_graphs import erdos_renyi_graph


def _edges(n=30, seed=3):
    _, ei = erdos_renyi_graph(n, p=0.25, num_features=2, seed=seed)
    return ei, n


def test_native_graclus_builds_and_is_valid():
    native = pytest.importorskip("tgp_tpu._native")
    ei, n = _edges()
    cluster = native.native_graclus_matching(ei, n, seed=7)
    assert cluster.shape == (n,)
    k = cluster.max() + 1
    assert 0 < k <= n
    # matching property: each cluster has 1 or 2 members
    counts = np.bincount(cluster)
    assert counts.max() <= 2
    # matched pairs are actual edges
    adj = set(map(tuple, ei.T))
    for c in range(k):
        members = np.nonzero(cluster == c)[0]
        if len(members) == 2:
            u, v = members
            assert (u, v) in adj or (v, u) in adj


def test_native_matching_matches_greedy_oracle():
    native = pytest.importorskip("tgp_tpu._native")
    ei, n = _edges(seed=5)
    e = ei.shape[1]
    rng = np.random.default_rng(0)
    rank = rng.permutation(e)
    match = native.native_maximal_matching(ei, n, rank)
    # oracle: sequential greedy in rank order
    used = np.zeros(n, bool)
    expect = np.zeros(e, bool)
    for i in np.argsort(rank):
        u, v = ei[0, i], ei[1, i]
        if u != v and not used[u] and not used[v]:
            expect[i] = True
            used[u] = used[v] = True
    np.testing.assert_array_equal(match, expect)


def test_native_propagation():
    native = pytest.importorskip("tgp_tpu._native")
    # path graph 0-1-2-3-4, seed nodes 0 and 4 assigned
    ei = np.array([[0, 1, 1, 2, 2, 3, 3, 4],
                   [1, 0, 2, 1, 3, 2, 4, 3]])
    a = np.array([0, -1, -1, -1, 1], np.int64)
    out = native.native_propagate_assignments(ei, a, max_iter=3,
                                              num_clusters=2)
    assert (out >= 0).all()
    assert out[1] == 0 and out[3] == 1


def test_native_sep_merge_matches_python_structure():
    native = pytest.importorskip("tgp_tpu._native")
    from tgp_tpu.precoarsen.sep import sep_coding_tree, sep_levels

    ei, n = _edges(n=24, seed=9)
    # native path builds a valid tree covering all leaves
    nodes, root = sep_coding_tree(ei, n, max_height=2, use_native=True)
    assert sorted(nodes[root].leaves) == list(range(n))
    # both paths produce valid level partitions of equal granularity class
    lv_native = sep_levels(ei, n, levels=1)
    nodes_py, root_py = sep_coding_tree(ei, n, max_height=2,
                                        use_native=False)
    assert sorted(nodes_py[root_py].leaves) == list(range(n))
    part = lv_native[0]["cluster_index"]
    assert part.shape == (n,)
    assert part.max() + 1 == lv_native[0]["num_clusters"]
