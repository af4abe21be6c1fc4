"""The scatter-free dense fast path must match the (oracle-verified) sparse
topk pipeline given the same weights."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tgp_tpu.graph import from_graphs, to_dense
from tgp_tpu.models.fast_dense import DenseTopkClassifier, dense_topk_pool
from tgp_tpu.poolers import get_pooler
from tests.utils_graphs import make_batch


def test_dense_topk_pool_matches_sparse_topk():
    b = make_batch([12, 9, 7], num_features=6, seed=3, weighted=True,
                   pad_nodes=32, pad_edges=192)
    dense = to_dense(b)
    pooler = get_pooler("topk", in_channels=6, ratio=0.5)
    params = pooler.init(jax.random.key(5), b)
    out = pooler.apply(params, b)
    sparse_pooled = to_dense(out.graph)

    w = jnp.asarray(params["params"]["selector"]["weight"])
    score_flat = jnp.tanh(
        (b.x @ w) / jnp.maximum(jnp.linalg.norm(w), 1e-12))
    # scatter the flat score into the dense layout
    score = jnp.zeros(dense.mask.shape).at[
        b.node_graph, b.node_pos].set(jnp.where(b.node_mask, score_flat, 0))
    pooled = dense_topk_pool(dense, score, ratio=0.5)

    K = out.graph.max_nodes
    np.testing.assert_array_equal(np.asarray(pooled.mask)[:, :K],
                                  np.asarray(sparse_pooled.mask))
    np.testing.assert_allclose(np.asarray(pooled.x)[:, :K],
                               np.asarray(sparse_pooled.x),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(pooled.adj)[:, :K, :K],
                               np.asarray(sparse_pooled.adj),
                               rtol=1e-5, atol=1e-6)


def test_dense_topk_classifier_trains():
    import optax

    b = make_batch([16] * 8, num_features=8, seed=0, pad_nodes=128,
                   pad_edges=1280)
    dense = to_dense(b)
    y = jnp.asarray(np.random.default_rng(0).integers(0, 3, 8))
    model = DenseTopkClassifier(num_classes=3, hidden=16)
    params = model.init(jax.random.key(0), dense)
    tx = optax.adam(1e-2)
    opt = tx.init(params)

    @jax.jit
    def step(p, o):
        def loss_fn(p):
            logits, _ = model.apply(p, dense)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()

        l, g = jax.value_and_grad(loss_fn)(p)
        up, o = tx.update(g, o)
        return optax.apply_updates(p, up), o, l

    l0 = None
    for i in range(30):
        params, opt, l = step(params, opt)
        if l0 is None:
            l0 = l
    assert float(l) < float(l0), (float(l0), float(l))
    assert np.isfinite(float(l))


def test_onehot_and_gather_pool_impls_agree():
    """The MXU one-hot path (P·A·Pᵀ, P·X) and the take_along_axis path are
    two layouts of the same selection — values AND gradients must agree."""
    b = make_batch([14, 9, 11], num_features=8, seed=11, weighted=True,
                   pad_nodes=40, pad_edges=256)
    dense = to_dense(b)
    rng = np.random.default_rng(0)
    score = jnp.tanh(jnp.asarray(
        rng.normal(size=dense.mask.shape).astype(np.float32)))

    p_oh = dense_topk_pool(dense, score, ratio=0.5, impl="onehot")
    p_ga = dense_topk_pool(dense, score, ratio=0.5, impl="gather")
    np.testing.assert_array_equal(np.asarray(p_oh.mask), np.asarray(p_ga.mask))
    np.testing.assert_allclose(np.asarray(p_oh.x), np.asarray(p_ga.x),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(p_oh.adj), np.asarray(p_ga.adj),
                               rtol=1e-5, atol=1e-6)

    def loss(x, impl):
        d = dense.__class__(x=x, adj=dense.adj, mask=dense.mask)
        return (dense_topk_pool(d, score, ratio=0.5, impl=impl).x ** 2).sum()

    g_oh = jax.grad(lambda x: loss(x, "onehot"))(dense.x)
    g_ga = jax.grad(lambda x: loss(x, "gather"))(dense.x)
    np.testing.assert_allclose(np.asarray(g_oh), np.asarray(g_ga),
                               rtol=1e-5, atol=1e-6)
