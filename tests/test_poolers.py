"""Uniform pooler contract tests over all registered aliases
(reference: tests/test_poolers.py:26-80 — one PARAMS dict, shape invariants,
forward + lift for every pooler)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tgp_tpu.poolers import get_pooler, pooler_map
from tests.utils_graphs import make_batch

PARAMS = dict(in_channels=6, ratio=0.5, k=4)

SPARSE_OUT_ALIASES = [
    "topk", "sag", "ec", "kmis", "graclus", "maxcut", "nopool",
]
DENSE_ALIASES = ["mincut", "diff", "dmon", "hosc", "jb", "acc"]


@pytest.fixture(scope="module")
def batch():
    return make_batch([8, 5, 11], num_features=6, seed=9, weighted=True,
                      pad_nodes=32, pad_edges=160)


def _init_and_run(alias, batch, **extra):
    pooler = get_pooler(alias, **{**PARAMS, **extra})
    params = pooler.init(jax.random.key(0), batch)
    out = pooler.apply(params, batch)
    return pooler, params, out


@pytest.mark.parametrize("alias", SPARSE_OUT_ALIASES)
def test_sparse_pooler_contract(alias, batch):
    pooler, params, out = _init_and_run(alias, batch)
    g = out.graph
    assert g is not None
    # pooled mask non-empty, no more supernodes than nodes per graph
    counts = np.asarray(g.nodes_per_graph())
    orig = np.asarray(batch.nodes_per_graph())
    assert (counts >= 1).all()
    assert (counts <= orig).all()
    # every valid node assigned to a valid, same-graph supernode
    so = out.so
    sel = np.asarray(so.node_sel_mask)
    ci = np.asarray(so.cluster_index)
    ng = np.asarray(batch.node_graph)
    cg = np.asarray(so.cluster_graph)
    om = np.asarray(so.out_mask())
    for i in np.nonzero(sel)[0]:
        assert om[ci[i]], f"{alias}: node {i} → invalid supernode {ci[i]}"
        assert cg[ci[i]] == ng[i], f"{alias}: cross-graph assignment"
    # pooled edges within graphs, valid endpoints
    em, s, r = map(np.asarray, (g.edge_mask, g.senders, g.receivers))
    gng, gnm = np.asarray(g.node_graph), np.asarray(g.node_mask)
    for e in np.nonzero(em)[0]:
        assert gnm[s[e]] and gnm[r[e]]
        assert gng[s[e]] == gng[r[e]]
    # finite outputs
    assert np.isfinite(np.asarray(g.x)).all()
    for v in out.loss.values():
        assert np.isfinite(float(v))


@pytest.mark.parametrize("alias", SPARSE_OUT_ALIASES)
def test_sparse_pooler_lift(alias, batch):
    pooler, params, out = _init_and_run(alias, batch)
    x_lift = pooler.apply(params, batch, so=out.so, lifting=True,
                          x=out.graph.x)
    assert x_lift.shape == batch.x.shape
    assert np.isfinite(np.asarray(x_lift)).all()


@pytest.mark.parametrize("alias", ["kmis", "graclus", "maxcut", "ec"])
def test_total_assignment_covers_all_nodes(alias, batch):
    pooler, params, out = _init_and_run(alias, batch)
    so = out.so
    sel = np.asarray(so.node_sel_mask)
    nm = np.asarray(batch.node_mask)
    # total assignments: every valid node is assigned
    np.testing.assert_array_equal(sel, nm)


def test_registry_complete():
    aliases = set(pooler_map())
    for a in SPARSE_OUT_ALIASES + DENSE_ALIASES:
        assert a in aliases, a


JIT_ALIASES = ["topk", "sag", "asap", "ec", "kmis", "graclus", "maxcut",
               "mincut", "diff", "dmon", "hosc", "jb", "acc"]


@pytest.mark.parametrize("alias", JIT_ALIASES)
def test_jit_matches_eager(alias, batch):
    """jit and eager forwards agree exactly (catches trace-dependent
    control flow and shape-dependent branches)."""
    pooler, params, out_e = _init_and_run(alias, batch)

    @jax.jit
    def fwd(p, b):
        return pooler.apply(p, b)

    out_j = fwd(params, batch)
    a = out_e.graph.x if out_e.graph is not None else out_e.dense.x
    b_ = out_j.graph.x if out_j.graph is not None else out_j.dense.x
    np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-5,
                               atol=1e-6, err_msg=alias)
    for name in out_e.loss:
        np.testing.assert_allclose(float(out_e.loss[name]),
                                   float(out_j.loss[name]), rtol=1e-5,
                                   atol=1e-6, err_msg=f"{alias}:{name}")


@pytest.mark.parametrize("alias", JIT_ALIASES)
def test_gradients_finite_and_nonzero(alias, batch):
    """Trainable poolers: grads finite, and non-trivial for all param
    leaves that the forward touches."""
    pooler = get_pooler(alias, **PARAMS)
    if not getattr(pooler, "IS_TRAINABLE", False):
        pytest.skip("non-trainable")
    params = pooler.init(jax.random.key(0), batch)
    if not jax.tree_util.tree_leaves(params):
        pytest.skip("no params")

    def loss(p):
        out = pooler.apply(p, batch)
        x = out.graph.x if out.graph is not None else out.dense.x
        return jnp.sum(x ** 2) + out.loss_sum()

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves), alias
    assert any(bool(jnp.any(l != 0)) for l in leaves), alias


@pytest.mark.parametrize("alias", JIT_ALIASES)
def test_padding_invariance(alias, batch):
    """Adding extra padding slots must not change valid outputs (the core
    static-shape contract)."""
    big = make_batch([8, 5, 11], num_features=6, seed=9, weighted=True,
                     pad_nodes=48, pad_edges=256)
    pooler = get_pooler(alias, **PARAMS)
    params = pooler.init(jax.random.key(0), batch)
    out_a = pooler.apply(params, batch)
    out_b = pooler.apply(params, big)
    if out_a.graph is not None:
        xa, ma = out_a.graph.x, out_a.graph.node_mask
        xb, mb = out_b.graph.x, out_b.graph.node_mask
        ga, gb = out_a.graph.node_graph, out_b.graph.node_graph
        # compare per-graph multisets of valid supernode features
        for g_ in range(3):
            rows_a = np.asarray(xa)[np.asarray(ma & (ga == g_))]
            rows_b = np.asarray(xb)[np.asarray(mb & (gb == g_))]
            ka = rows_a[np.lexsort(rows_a.T)]
            kb = rows_b[np.lexsort(rows_b.T)]
            np.testing.assert_allclose(ka, kb, rtol=1e-4, atol=1e-5,
                                       err_msg=f"{alias} graph {g_}")
    else:
        np.testing.assert_allclose(np.asarray(out_a.dense.x),
                                   np.asarray(out_b.dense.x), rtol=1e-4,
                                   atol=1e-5, err_msg=alias)
    for name in out_a.loss:
        np.testing.assert_allclose(float(out_a.loss[name]),
                                   float(out_b.loss[name]), rtol=1e-4,
                                   atol=1e-5, err_msg=f"{alias}:{name}")
