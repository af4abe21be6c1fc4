"""Hierarchical composability: pooled GraphBatches feed further poolers
(multi-level models, the reference's hierarchical-GNN use case)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tgp_tpu.poolers import get_pooler
from tests.utils_graphs import make_batch


def test_topk_twice():
    b = make_batch([12, 9, 15], num_features=6, seed=3, weighted=True)
    p1 = get_pooler("topk", in_channels=6, ratio=0.5)
    p2 = get_pooler("topk", in_channels=6, ratio=0.5)
    params1 = p1.init(jax.random.key(0), b)
    out1 = p1.apply(params1, b)
    g1 = out1.graph
    params2 = p2.init(jax.random.key(1), g1)
    out2 = p2.apply(params2, g1)
    g2 = out2.graph
    c0 = np.asarray(b.nodes_per_graph())
    c1 = np.asarray(g1.nodes_per_graph())
    c2 = np.asarray(g2.nodes_per_graph())
    np.testing.assert_array_equal(c1, np.ceil(0.5 * c0))
    np.testing.assert_array_equal(c2, np.ceil(0.5 * c1))
    assert np.isfinite(np.asarray(g2.x)).all()


def test_graclus_then_compact_then_topk():
    from tgp_tpu.select.base import compact_select_output
    from tgp_tpu.select.graclus import graclus_select
    from tgp_tpu.src import SRCPooling

    b = make_batch([12, 9, 15], num_features=6, seed=5, weighted=True)
    pooler = get_pooler("graclus")
    so = graclus_select(b)
    so_c = compact_select_output(so, budget_per_graph=b.max_nodes)
    out = pooler(b, so=so_c)
    g1 = out.graph
    assert g1.max_nodes == b.max_nodes
    # stack a trainable pooler on the compacted coarse graph
    p2 = get_pooler("topk", in_channels=6, ratio=0.5)
    params = p2.init(jax.random.key(0), g1)
    out2 = p2.apply(params, g1)
    assert np.isfinite(np.asarray(out2.graph.x)).all()
    c1 = np.asarray(g1.nodes_per_graph())
    c2 = np.asarray(out2.graph.nodes_per_graph())
    np.testing.assert_array_equal(c2, np.ceil(0.5 * c1))


def test_sparse_then_dense_hierarchy():
    """topk (sparse out) → mincut (dense pooler consuming sparse batch)."""
    b = make_batch([12, 9, 15], num_features=6, seed=7)
    p1 = get_pooler("topk", in_channels=6, ratio=0.5)
    params1 = p1.init(jax.random.key(0), b)
    g1 = p1.apply(params1, b).graph
    p2 = get_pooler("mincut", in_channels=6, k=3)
    params2 = p2.init(jax.random.key(1), g1)
    out2 = p2.apply(params2, g1)
    assert out2.dense.x.shape == (3, 3, 6)
    for v in out2.loss.values():
        assert np.isfinite(float(v))


def test_end_to_end_two_level_training():
    from flax import linen as nn
    import optax
    from tgp_tpu.mp.gcn import GCNConv
    from tgp_tpu.reduce.global_reduce import global_reduce

    class TwoLevel(nn.Module):
        @nn.compact
        def __call__(self, batch):
            h = nn.relu(GCNConv(16)(batch))
            out1 = get_pooler("topk", in_channels=16, ratio=0.5)(
                batch.with_features(h))
            g1 = out1.graph
            h = nn.relu(GCNConv(16)(g1, g1.x))
            out2 = get_pooler("topk", in_channels=16, ratio=0.5)(
                g1.with_features(h))
            g2 = out2.graph
            z = global_reduce(g2.x, node_graph=g2.node_graph,
                              num_graphs=g2.num_graphs,
                              node_mask=g2.node_mask, op="sum")
            return nn.Dense(2)(z)

    b = make_batch([12, 9, 15], num_features=6, seed=9)
    y = jnp.asarray(np.array([0, 1, 0]))
    model = TwoLevel()
    params = model.init(jax.random.key(0), b)

    @jax.jit
    def loss_fn(p):
        logits = model.apply(p, b)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, y).mean()

    l0 = float(loss_fn(params))
    g = jax.grad(loss_fn)(params)
    tx = optax.sgd(0.5)
    upd, _ = tx.update(g, tx.init(params))
    params2 = optax.apply_updates(params, upd)
    l1 = float(loss_fn(params2))
    assert np.isfinite(l0) and np.isfinite(l1)
    assert l1 < l0  # one step reduces the loss
