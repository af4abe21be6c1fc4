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
