"""Precoarsening pipeline tests: level functions, PreCoarsening transform,
pooled-loader collation, and a training-style reduce over collated levels
(reference: tests/test_precoarsening.py:40-414)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tgp_tpu.data.pooled_loader import PooledGraphLoader
from tgp_tpu.precoarsen import PreCoarsening, precoarsen_graph
from tgp_tpu.reduce.base import base_reduce
from tgp_tpu.reduce.eigenpool import eigenpool_reduce
from tests.utils_graphs import erdos_renyi_graph


def _graphs(n_graphs=6, seed=0):
    gs = []
    for i in range(n_graphs):
        n = 10 + 3 * (i % 3)
        x, ei = erdos_renyi_graph(n, p=0.35, num_features=5, seed=seed + i)
        gs.append((x, ei))
    return gs


@pytest.mark.parametrize("alias,kw", [
    ("ndp", {}),
    ("graclus", {}),
    ("nmf", {"k": 4}),
    ("eigen", {"k": 3, "num_modes": 2}),
    ("sep", {}),
])
def test_level_functions(alias, kw):
    x, ei = erdos_renyi_graph(14, p=0.35, num_features=5, seed=1)
    levels = precoarsen_graph(alias, ei, 14, levels=2, **kw)
    assert len(levels) == 2
    for lvl in levels:
        k = lvl["num_clusters"]
        assert k >= 1
        ei_p = np.asarray(lvl["edge_index"])
        if ei_p.size:
            assert ei_p.max() < k
        if lvl["kind"] == "sparse":
            ci = np.asarray(lvl["cluster_index"])
            assert (ci[ci >= 0] < k).all()
        else:
            s = np.asarray(lvl.get("s", lvl.get("theta")))
            assert s.shape[0] > 0
    # coarsening shrinks (ndp/graclus/sep halve-ish)
    if alias in ("ndp", "graclus"):
        assert levels[0]["num_clusters"] < 14


def test_precoarsening_transform_collapse():
    tf = PreCoarsening(poolers="graclus", levels=3)
    g = _graphs(1)[0]
    out = tf(g)
    levels = out[-1]
    assert len(levels) == 3
    sizes = [l["num_clusters"] for l in levels]
    assert sizes[0] >= sizes[1] >= sizes[2]


def test_mixed_schedule():
    tf = PreCoarsening(poolers=[("ndp", {}), ("graclus", {})])
    out = tf(_graphs(1)[0])
    assert len(out[-1]) == 2


@pytest.mark.parametrize("alias,kw", [
    ("graclus", {}), ("ndp", {}), ("nmf", {"k": 4}),
])
def test_pooled_loader_and_reduce(alias, kw):
    tf = PreCoarsening(poolers=alias, levels=2, kwargs=kw)
    graphs = [tf(g) for g in _graphs(6)]
    labels = np.arange(6) % 2
    loader = PooledGraphLoader(graphs, labels, batch_size=3)
    for batch, level_batches, y in loader:
        assert len(level_batches) == 2
        x = batch.x
        node_graph = batch.node_graph
        for lb in level_batches:
            x_pool = base_reduce(x, lb.so)
            x = lb.place_features(x_pool)
            assert x.shape[0] == lb.graph.num_nodes
            gm = np.asarray(lb.graph.node_mask)
            cg = np.asarray(lb.graph.node_graph)
            # every graph has at least one valid supernode
            for g in range(batch.num_graphs):
                assert gm[cg == g].sum() >= 1
            assert np.isfinite(np.asarray(x)).all()
            node_graph = lb.graph.node_graph
        break


def test_eigen_loader_reduce():
    tf = PreCoarsening(poolers="eigen", levels=1,
                       kwargs={"k": 3, "num_modes": 2})
    graphs = [tf(g) for g in _graphs(4)]
    loader = PooledGraphLoader(graphs, batch_size=2)
    for batch, level_batches in loader:
        lb = level_batches[0]
        xp = eigenpool_reduce(batch.x, lb.so)
        assert xp.shape == (2, lb.so.num_clusters,
                            2 * batch.num_features)
        assert np.isfinite(np.asarray(xp)).all()
        # the collated SelectOutput must also trace: num_modes is static
        # metadata (an extras leaf would be a tracer under jit)
        assert lb.so.num_modes == 2
        xp_jit = jax.jit(eigenpool_reduce)(batch.x, lb.so)
        np.testing.assert_allclose(np.asarray(xp_jit), np.asarray(xp),
                                   rtol=1e-5, atol=1e-6)
        # features must carry signal (a k=K singleton schedule zeroes Θ)
        assert float(jnp.abs(xp).sum()) > 0
        # place the reduce output into the pooled node space under jit
        placed = jax.jit(lambda x, l: l.place_features(x))(xp, lb)
        assert placed.shape[0] == lb.graph.num_nodes
        break


@pytest.mark.parametrize("alias,kw", [
    ("graclus", {}),
    ("ndp", {}),
    ("nmf", {"k": 4}),
    ("eigen", {"k": 3, "num_modes": 2}),
])
def test_collate_separate_roundtrip(alias, kw):
    """collate_level ∘ separate_level == identity on per-graph level dicts
    (the reference's collate/separate round-trip property,
    tgp/data/collate.py:81-403)."""
    from tgp_tpu.data.pooled_loader import collate_level, separate_level

    graphs = _graphs(4, seed=3)
    per_graph = [precoarsen_graph(alias, ei, x.shape[0], levels=1, **kw)[0]
                 for x, ei in graphs]
    n_per = [x.shape[0] for x, _ in graphs]
    off = np.concatenate([[0], np.cumsum(n_per)[:-1]])
    pad_prev = int(sum(n_per) + 8)
    pad_c = int(sum(l["num_clusters"] for l in per_graph) + 8)
    pad_e = int(sum(np.asarray(l["edge_index"]).shape[1]
                    for l in per_graph) + 16)
    kmax = max(l["num_clusters"] for l in per_graph)

    lb = collate_level(per_graph, off, pad_prev, pad_c, pad_e, kmax,
                       feature_dim=5)
    back = separate_level(lb, off, n_per)

    assert len(back) == len(per_graph)
    for orig, rec in zip(per_graph, back):
        assert rec["kind"] == orig["kind"]
        assert rec["num_clusters"] == int(orig["num_clusters"])
        # edge lists equal as multisets of weighted edges
        eo = np.asarray(orig["edge_index"])
        er = np.asarray(rec["edge_index"])
        wo = np.asarray(orig["edge_weight"])
        wr = np.asarray(rec["edge_weight"])
        assert er.shape == eo.shape
        po = np.lexsort(eo[::-1]); pr = np.lexsort(er[::-1])
        np.testing.assert_array_equal(er[:, pr], eo[:, po])
        np.testing.assert_allclose(wr[pr], wo[po], rtol=1e-6)
        if orig["kind"] == "sparse":
            ci_o = np.asarray(orig["cluster_index"])
            ci_r = np.asarray(rec["cluster_index"])[: ci_o.shape[0]]
            np.testing.assert_array_equal(ci_r, ci_o)
            np.testing.assert_allclose(
                np.asarray(rec["weight"])[: ci_o.shape[0]],
                np.asarray(orig["weight"]), rtol=1e-6)
        elif orig["kind"] == "eigen":
            assert rec["num_modes"] == int(orig["num_modes"])
            th_o = np.asarray(orig["theta"], np.float32)
            np.testing.assert_allclose(
                np.asarray(rec["theta"])[:, : th_o.shape[1]], th_o,
                rtol=1e-6)
        else:
            s_o = np.asarray(orig["s"], np.float32)
            np.testing.assert_allclose(
                np.asarray(rec["s"])[:, : s_o.shape[1]], s_o, rtol=1e-6)


@pytest.mark.parametrize("alias,kw", [
    ("graclus", {}), ("ndp", {}), ("sep", {}),
    ("nmf", {"k": 2}), ("eigen", {"k": 2}),
])
@pytest.mark.parametrize("case", ["edgeless", "single", "two_components"])
def test_precoarsen_degenerate_graphs(alias, kw, case):
    """Host selectors must survive edgeless, singleton, and disconnected
    inputs (the reference's per-selector degenerate cases)."""
    if case == "edgeless":
        ei, n = np.zeros((2, 0), np.int64), 3
    elif case == "single":
        ei, n = np.zeros((2, 0), np.int64), 1
    else:  # two 2-cliques plus two isolated nodes
        ei, n = np.asarray([[0, 1, 3, 4], [1, 0, 4, 3]]), 6
    levels = precoarsen_graph(alias, ei, n, levels=2, **kw)
    assert len(levels) == 2
    for lvl in levels:
        assert lvl["num_clusters"] >= 1
        ei_p = np.asarray(lvl["edge_index"])
        if ei_p.size:
            assert ei_p.max() < lvl["num_clusters"]
            assert np.isfinite(np.asarray(lvl["edge_weight"])).all()


def test_pooled_loader_short_dataset_cycles():
    """PooledGraphLoader on a dataset smaller than one batch: level budgets
    must bound the cycled batch (same regression as GraphLoader)."""
    tf = PreCoarsening(poolers="graclus", levels=1)
    graphs = [tf(g) for g in _graphs(3)]
    loader = PooledGraphLoader(graphs, np.arange(3), batch_size=8)
    for batch, levels, y in loader:
        assert batch.num_graphs == 8
        lb = levels[0]
        x_pool = base_reduce(batch.x, lb.so)
        assert np.isfinite(np.asarray(x_pool)).all()
        break


def test_register_precoarsener_both_forms():
    """register_precoarsener works as a plain call AND as a decorator
    (fn=None branch); unknown aliases list the registry."""
    from tgp_tpu.precoarsen.api import (
        PRECOARSENERS,
        precoarsen_graph,
        register_precoarsener,
    )

    def fake_level(edge_index, num_nodes, edge_weight=None, **kw):
        import numpy as np

        return {
            "cluster_index": np.zeros(num_nodes, np.int64),
            "num_clusters": 1,
            "edge_index": np.zeros((2, 0), np.int64),
            "edge_weight": np.zeros(0, np.float32),
            "kind": "sparse",
        }

    try:
        register_precoarsener("fake_direct", fake_level)

        @register_precoarsener("fake_deco")
        def fake2(edge_index, num_nodes, edge_weight=None, **kw):
            return fake_level(edge_index, num_nodes, edge_weight, **kw)

        ei = np.array([[0, 1], [1, 0]])
        for alias in ("fake_direct", "fake_deco"):
            out = precoarsen_graph(alias, ei, 2)
            assert out[0]["num_clusters"] == 1

        with pytest.raises(ValueError, match="unknown precoarsener"):
            precoarsen_graph("nope", ei, 2)
    finally:
        PRECOARSENERS.pop("fake_direct", None)
        PRECOARSENERS.pop("fake_deco", None)


def test_precoarsening_single_string_config_replicates():
    """PreCoarsening(poolers='graclus', levels=2): the single-string config
    branch replicates the alias across levels."""
    from tgp_tpu.precoarsen.api import PreCoarsening

    rng = np.random.default_rng(0)
    n = 12
    upper = np.triu(rng.random((n, n)) < 0.4, k=1)
    adj = upper | upper.T
    s, r = np.nonzero(adj)
    x = rng.normal(size=(n, 3)).astype(np.float32)
    pc = PreCoarsening(poolers="graclus", levels=2)
    out = pc((x, np.stack([s, r])))
    levels = out[-1]
    assert len(levels) == 2
    assert levels[1]["num_clusters"] <= levels[0]["num_clusters"]
