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
        break
