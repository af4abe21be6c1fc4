"""GraphBatch collation and dense round-trip tests."""

import jax.numpy as jnp
import numpy as np

from tgp_tpu.graph import from_dense, from_graphs, to_dense
from tests.utils_graphs import erdos_renyi_graph, make_batch


def test_from_graphs_layout(small_batch):
    b = small_batch
    assert b.num_graphs == 3
    assert b.num_nodes == 32 and b.num_edges == 128
    counts = np.asarray(b.nodes_per_graph())
    np.testing.assert_array_equal(counts, [7, 5, 9])
    assert b.max_nodes == 9
    # packed: valid nodes first, graph ids ascending
    nm = np.asarray(b.node_mask)
    assert nm[:21].all() and not nm[21:].any()
    ng = np.asarray(b.node_graph)[:21]
    assert (np.diff(ng) >= 0).all()
    # padded edges have zero weight
    ew = np.asarray(b.edge_weight)
    em = np.asarray(b.edge_mask)
    assert np.all(ew[~em] == 0)


def test_dense_roundtrip():
    b = make_batch([6, 4, 8], num_features=5, seed=3, weighted=True)
    d = to_dense(b)
    assert d.x.shape == (3, 8, 5)
    assert d.adj.shape == (3, 8, 8)
    # masks match per-graph sizes
    np.testing.assert_array_equal(np.asarray(d.mask).sum(1), [6, 4, 8])
    # dense adj agrees with a numpy oracle
    s, r = np.asarray(b.senders), np.asarray(b.receivers)
    w, em = np.asarray(b.edge_weight), np.asarray(b.edge_mask)
    ng, pos = np.asarray(b.node_graph), np.asarray(b.node_pos)
    expect = np.zeros((3, 8, 8), np.float32)
    for e in range(len(s)):
        if em[e]:
            g = ng[s[e]]
            expect[g, pos[s[e]], pos[r[e]]] += w[e]
    np.testing.assert_allclose(np.asarray(d.adj), expect, rtol=1e-5, atol=1e-6)

    # back to sparse: same dense re-materialization
    b2 = from_dense(d)
    d2 = to_dense(b2)
    np.testing.assert_allclose(np.asarray(d2.adj), expect, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(d2.x), np.asarray(d.x), rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(d2.mask), np.asarray(d.mask))


def test_single_graph():
    x, ei = erdos_renyi_graph(10, seed=1)
    b = from_graphs([(x, ei)])
    assert b.num_graphs == 1
    assert int(b.nodes_per_graph()[0]) == 10
    d = to_dense(b)
    assert d.x.shape[0] == 1


def test_from_graphs_edge_cases():
    """Branch matrix of the collator: 1-D features, explicit weights,
    empty list, too-small budgets, max_nodes guard."""
    import pytest

    from tgp_tpu.graph import from_graphs

    # 1-D features are promoted to [N, 1]
    b = from_graphs([(np.ones(4, np.float32), np.array([[0, 1], [1, 0]]))])
    assert b.x.shape[1] == 1

    # explicit edge weights pass through
    ei = np.array([[0, 1], [1, 0]])
    w = np.array([2.0, 3.0], np.float32)
    b = from_graphs([(np.ones((2, 3), np.float32), ei, w)])
    em = np.asarray(b.edge_mask)
    np.testing.assert_allclose(np.asarray(b.edge_weight)[em], [2.0, 3.0])

    with pytest.raises(ValueError, match="at least one graph"):
        from_graphs([])

    with pytest.raises(ValueError, match="max_nodes"):
        from_graphs([(np.ones((5, 2), np.float32), ei)], max_nodes=3)

    with pytest.raises(ValueError, match="padding budget too small"):
        from_graphs([(np.ones((5, 2), np.float32), ei)], pad_nodes=3)


def test_from_graphs_sort_edges_layout():
    from tgp_tpu.graph import from_graphs

    rng = np.random.default_rng(0)
    n = 10
    ei = np.stack([rng.integers(0, n, 30), rng.integers(0, n, 30)])
    b = from_graphs([(rng.normal(size=(n, 2)).astype(np.float32), ei)],
                    sort_edges=True)
    r = np.asarray(b.receivers)
    em = np.asarray(b.edge_mask)
    assert (np.diff(r[em]) >= 0).all()
    assert b.edges_sorted


def test_from_dense_keep_self_loops_branch():
    from tgp_tpu.graph import DenseGraphBatch, from_dense

    adj = np.zeros((1, 3, 3), np.float32)
    adj[0, 0, 0] = 1.0   # self-loop
    adj[0, 0, 1] = 2.0
    x = np.ones((1, 3, 2), np.float32)
    mask = np.array([[True, True, False]])
    dense = DenseGraphBatch(x=jnp.asarray(x), adj=jnp.asarray(adj),
                            mask=jnp.asarray(mask))
    with_loops = from_dense(dense)  # default keeps self-loops
    without = from_dense(dense, keep_self_loops=False)
    assert int(np.asarray(without.edge_mask).sum()) == 1
    assert int(np.asarray(with_loops.edge_mask).sum()) == 2


def test_to_dense_explicit_max_nodes():
    from tgp_tpu.graph import from_graphs, to_dense

    ei = np.array([[0, 1], [1, 0]])
    b = from_graphs([(np.ones((3, 2), np.float32), ei)])
    d = to_dense(b, max_nodes=8)
    assert d.x.shape == (1, 8, 2)
    assert d.adj.shape == (1, 8, 8)
    assert np.asarray(d.mask).sum() == 3
