"""Randomized contract sweep: pooler invariants across graph-shape regimes
and hyperparameter extremes the single-fixture contract tests don't reach
(ratio=1.0, k > n, many tiny graphs, wide size spread)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tgp_tpu.poolers import get_pooler
from tests.utils_graphs import make_batch

SPARSE = ["topk", "sag", "ec", "kmis", "graclus", "maxcut"]
DENSE = ["mincut", "diff", "dmon", "jb", "acc"]

REGIMES = {
    # many tiny graphs (1-3 nodes each)
    "tiny": dict(sizes=[1, 2, 3, 1, 2, 3, 2], p=0.9, pad_nodes=24,
                 pad_edges=64),
    # wide size spread in one batch
    "spread": dict(sizes=[2, 23, 5, 17], p=0.25, pad_nodes=56,
                   pad_edges=256),
}


def _get(regime):
    cfg = dict(REGIMES[regime])
    sizes = cfg.pop("sizes")
    p = cfg.pop("p")
    return make_batch(sizes, num_features=5, seed=hash(regime) % 1000,
                      weighted=True, p=p, **cfg)


def _check_sparse_out(out, batch):
    g = out.graph
    assert np.isfinite(np.asarray(g.x)).all()
    nm = np.asarray(g.node_mask)
    np.testing.assert_array_equal(np.asarray(g.x)[~nm], 0.0)
    em = np.asarray(g.edge_mask)
    s, r = np.asarray(g.senders)[em], np.asarray(g.receivers)[em]
    assert nm[s].all() and nm[r].all()  # valid edges touch valid supernodes
    ng = np.asarray(g.node_graph)
    np.testing.assert_array_equal(ng[s], ng[r])  # graph-boundary respect
    counts = np.asarray(g.nodes_per_graph())
    assert (counts >= 1).all()
    assert (counts <= np.asarray(batch.nodes_per_graph())).all()
    for name, v in (out.loss or {}).items():
        assert np.isfinite(float(v)), name


@pytest.mark.parametrize("regime", sorted(REGIMES))
@pytest.mark.parametrize("alias", SPARSE)
def test_sparse_poolers_on_regimes(alias, regime):
    batch = _get(regime)
    pooler = get_pooler(alias, in_channels=5, ratio=0.5)
    params = pooler.init(jax.random.key(0), batch)
    out = pooler.apply(params, batch)
    _check_sparse_out(out, batch)


@pytest.mark.parametrize("ratio", [0.999, 1.0])
def test_topk_ratio_one_keeps_everything(ratio):
    batch = _get("spread")
    pooler = get_pooler("topk", in_channels=5, ratio=ratio)
    params = pooler.init(jax.random.key(0), batch)
    out = pooler.apply(params, batch)
    np.testing.assert_array_equal(np.asarray(out.graph.nodes_per_graph()),
                                  np.asarray(batch.nodes_per_graph()))


def test_topk_tiny_ratio_keeps_at_least_one():
    batch = _get("spread")
    pooler = get_pooler("topk", in_channels=5, ratio=0.01)
    params = pooler.init(jax.random.key(0), batch)
    out = pooler.apply(params, batch)
    np.testing.assert_array_equal(np.asarray(out.graph.nodes_per_graph()),
                                  1)


@pytest.mark.parametrize("regime", sorted(REGIMES))
@pytest.mark.parametrize("alias", DENSE)
def test_dense_poolers_k_exceeds_n(alias, regime):
    """k larger than some (or all) graph sizes: surplus clusters stay
    masked, losses stay finite (reference covers k>n via out_mask)."""
    batch = _get(regime)
    pooler = get_pooler(alias, in_channels=5, k=8)
    params = pooler.init(jax.random.key(0), batch)
    out = pooler.apply(params, batch)
    assert np.isfinite(np.asarray(out.dense.x)).all()
    m = np.asarray(out.dense.mask)
    assert m.shape == (batch.num_graphs, 8)
    for name, v in out.loss.items():
        assert np.isfinite(float(v)), name
    # adjacency rows of invalid clusters are zero
    adj = np.asarray(out.dense.adj)
    for b in range(batch.num_graphs):
        np.testing.assert_allclose(adj[b][~m[b]], 0.0, atol=1e-6)


def test_single_graph_single_node():
    batch = make_batch([1], num_features=5, seed=0, pad_nodes=8,
                       pad_edges=16)
    for alias in ("topk", "graclus", "mincut"):
        kw = {"k": 2} if alias == "mincut" else {"ratio": 0.5}
        pooler = get_pooler(alias, in_channels=5, **kw)
        params = pooler.init(jax.random.key(0), batch)
        out = pooler.apply(params, batch)
        x = out.graph.x if out.graph is not None else out.dense.x
        assert np.isfinite(np.asarray(x)).all(), alias
