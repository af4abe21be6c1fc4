"""Edge-case coverage (reference test category: empty-edge graphs,
single-node graphs, batch-boundary respect — tests/poolers/*)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tgp_tpu.graph import from_graphs
from tgp_tpu.poolers import get_pooler

ALIASES = ["topk", "sag", "ec", "kmis", "graclus", "maxcut", "mincut",
           "diff", "jb", "lap", "nopool"]


def _batch_with_edgeless_graph():
    """Graph 1 has NO edges; graph 0 and 2 are normal."""
    rng = np.random.default_rng(0)
    g0 = (rng.normal(size=(6, 5)).astype(np.float32),
          np.array([[0, 1, 2, 3], [1, 2, 3, 4]]))
    g1 = (rng.normal(size=(4, 5)).astype(np.float32),
          np.zeros((2, 0), np.int64))
    g2 = (rng.normal(size=(7, 5)).astype(np.float32),
          np.array([[0, 1, 2], [1, 2, 0]]))
    return from_graphs([g0, g1, g2], pad_nodes=24, pad_edges=64)


def _batch_with_single_node_graph():
    rng = np.random.default_rng(1)
    g0 = (rng.normal(size=(5, 5)).astype(np.float32),
          np.array([[0, 1], [1, 0]]))
    g1 = (rng.normal(size=(1, 5)).astype(np.float32),
          np.zeros((2, 0), np.int64))
    return from_graphs([g0, g1], pad_nodes=16, pad_edges=32)


@pytest.mark.parametrize("alias", ALIASES)
@pytest.mark.parametrize("maker", [_batch_with_edgeless_graph,
                                   _batch_with_single_node_graph])
def test_degenerate_graphs_finite(alias, maker):
    b = maker()
    pooler = get_pooler(alias, in_channels=5, ratio=0.5, k=3)
    params = pooler.init(jax.random.key(0), b)
    out = pooler.apply(params, b)
    x = out.graph.x if out.graph is not None else out.dense.x
    assert np.isfinite(np.asarray(x)).all(), alias
    for name, v in out.loss.items():
        assert np.isfinite(float(v)), f"{alias}:{name}"
    # every graph still has at least one pooled node
    if out.graph is not None:
        counts = np.asarray(out.graph.nodes_per_graph())
        assert (counts >= 1).all(), alias


@pytest.mark.parametrize("alias", ["topk", "mincut"])
def test_grad_finite_on_degenerate(alias):
    b = _batch_with_edgeless_graph()
    pooler = get_pooler(alias, in_channels=5, ratio=0.5, k=3)
    params = pooler.init(jax.random.key(0), b)

    def loss(p):
        out = pooler.apply(p, b)
        x = out.graph.x if out.graph is not None else out.dense.x
        return jnp.sum(x ** 2) + out.loss_sum()

    g = jax.grad(loss)(params)
    for l in jax.tree_util.tree_leaves(g):
        assert np.isfinite(np.asarray(l)).all(), alias
