"""EdgeContraction and LaPool branch matrices (reference:
tests/poolers/test_ecpool.py, test_lapool.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tgp_tpu.graph import from_graphs
from tgp_tpu.poolers import get_pooler
from tgp_tpu.select.lapool import lapool_select
from tests.utils_graphs import make_batch


@pytest.fixture(scope="module")
def batch():
    return make_batch([8, 5, 11], num_features=6, seed=9, weighted=True,
                      pad_nodes=32, pad_edges=160)


# ------------------------------------------------------------------ EC


@pytest.mark.parametrize("method", ["softmax", "tanh", "sigmoid"])
def test_ec_edge_score_methods(batch, method):
    pooler = get_pooler("ec", in_channels=6, edge_score_method=method)
    params = pooler.init(jax.random.key(0), batch)
    out = pooler.apply(params, batch)
    assert np.isfinite(np.asarray(out.graph.x)).all()
    # contraction at least halves nothing but never grows
    counts = np.asarray(out.graph.nodes_per_graph())
    assert (counts <= np.asarray(batch.nodes_per_graph())).all()


def test_ec_invalid_score_method(batch):
    pooler = get_pooler("ec", in_channels=6, edge_score_method="bogus")
    with pytest.raises(ValueError):
        pooler.init(jax.random.key(0), batch)


def test_ec_matching_is_valid_matching(batch):
    """Contracted clusters have ≤2 members, and every 2-member cluster is a
    real edge of the input graph (maximal-matching semantics, reference
    edge_contraction_select.py:14-110)."""
    pooler = get_pooler("ec", in_channels=6)
    params = pooler.init(jax.random.key(0), batch)
    so = pooler.apply(params, batch).so
    nm = np.asarray(so.node_mask)
    ci = np.asarray(so.cluster_index)
    sizes = np.bincount(ci[nm], minlength=so.num_clusters)
    assert sizes.max() <= 2
    edges = set()
    s, r = np.asarray(batch.senders), np.asarray(batch.receivers)
    for e in np.nonzero(np.asarray(batch.edge_mask))[0]:
        edges.add((min(s[e], r[e]), max(s[e], r[e])))
    for root in np.nonzero(sizes == 2)[0]:
        pair = np.nonzero(nm & (ci == root))[0]
        assert (pair.min(), pair.max()) in edges
    # matched members share their contracted edge's weight; singletons get 1
    w = np.asarray(so.weight)
    for root in np.nonzero(sizes == 1)[0]:
        node = np.nonzero(nm & (ci == root))[0]
        if node.size:
            np.testing.assert_allclose(w[node], 1.0)
    for root in np.nonzero(sizes == 2)[0]:
        pair = np.nonzero(nm & (ci == root))[0]
        assert w[pair[0]] == w[pair[1]]
        assert 0.0 < w[pair[0]] <= 1.5 + 1e-6  # score + add_to_edge_score


def test_ec_dropout_branch(batch):
    pooler = get_pooler("ec", in_channels=6, dropout=0.5)
    params = pooler.init(jax.random.key(0), batch)
    # deterministic (eval) path ignores dropout
    out = pooler.apply(params, batch)
    assert np.isfinite(np.asarray(out.graph.x)).all()


# -------------------------------------------------------------- LaPool


def test_lapool_constant_features_all_leaders():
    """Constant X ⇒ LX = 0 ⇒ every node ties as a local max (non-strict
    ``>=`` like the reference) ⇒ S = per-graph identity."""
    n = 6
    x = np.ones((n, 4), np.float32)
    s = np.arange(n - 1)
    ei = np.concatenate([np.stack([s, s + 1]), np.stack([s + 1, s])], 1)
    b = from_graphs([(x, ei)])
    so = lapool_select(b)
    S = np.asarray(so.s)[: n, : n]
    np.testing.assert_allclose(S, np.eye(n), atol=1e-6)


def test_lapool_single_isolated_node():
    """An isolated single-node graph: the node leads itself (neighbor max
    is −inf) — reference test_single_node_isolated."""
    x0 = np.random.default_rng(0).normal(size=(1, 4)).astype(np.float32)
    x1, ei1 = (np.random.default_rng(1).normal(size=(5, 4)).astype(
        np.float32), None)
    s = np.arange(4)
    ei1 = np.concatenate([np.stack([s, s + 1]), np.stack([s + 1, s])], 1)
    b = from_graphs([(x0, np.zeros((2, 0), np.int64)), (x1, ei1)])
    so = lapool_select(b)
    S = np.asarray(so.s)
    nm = np.asarray(b.node_mask)
    # the isolated node's row is a one-hot
    row0 = S[0]
    assert row0.max() == pytest.approx(1.0)
    assert row0.sum() == pytest.approx(1.0)
    # all valid rows are normalized (leaders one-hot, followers softmax)
    np.testing.assert_allclose(S[nm].sum(-1), 1.0, rtol=1e-5)


def test_lapool_leader_rows_one_hot(batch):
    so = lapool_select(batch)
    S = np.asarray(so.s)
    nm = np.asarray(batch.node_mask)
    # every valid row sums to 1; leader rows are exact one-hots
    np.testing.assert_allclose(S[nm].sum(-1), 1.0, rtol=1e-5)
    onehot_rows = (S[nm] == 1.0).any(-1)
    assert onehot_rows.sum() >= batch.num_graphs  # ≥1 leader per graph


def test_lapool_sp_reg_requires_host_weights(batch):
    with pytest.raises(NotImplementedError, match="sp_weight"):
        lapool_select(batch, shortest_path_reg=True)
