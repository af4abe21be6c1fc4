"""Unified sharded sparse pooling (VERDICT r4 #2): the node-sharded
forward must reproduce the single-device ``TopkPoolModel`` logits from the
SAME parameter tree, with the selection driven by a real
``get_pooler("topk")`` / ``get_pooler("sag")`` instance."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tgp_tpu.graph import from_graphs
from tgp_tpu.parallel.dense_pool import (
    device_put_sharded_dense,
    prepare_sharded_dense_graph,
)
from tgp_tpu.parallel.sparse_pool import (
    TopkPoolModel,
    make_sharded_topk_model_forward,
)
from tgp_tpu.parallel.train import make_mesh
from tgp_tpu.poolers import get_pooler

N_DEV = 8


def _random_graph(n, e, seed=0, feat=6):
    rng = np.random.default_rng(seed)
    s = rng.integers(0, n, e).astype(np.int64)
    r = rng.integers(0, n, e).astype(np.int64)
    keep = s != r
    s, r = (np.concatenate([s[keep], r[keep]]),
            np.concatenate([r[keep], s[keep]]))
    w = rng.uniform(0.5, 1.5, len(s)).astype(np.float32)
    x = rng.normal(size=(n, feat)).astype(np.float32)
    return x, s, r, w


def _setup(alias, n=48, e=160, seed=11, feat=6, **pool_kw):
    x, s, r, w = _random_graph(n, e, seed=seed, feat=feat)
    pool_kw.setdefault("ratio", 0.5)
    pooler = get_pooler(alias, in_channels=16, **pool_kw)
    model = TopkPoolModel(pooler=pooler, hidden=16, num_classes=3)
    (x_pad, mask, S, R, W, n_pad,
     rows_per) = prepare_sharded_dense_graph(x, s, r, w, n, N_DEV)
    flat = from_graphs([(x, np.stack([s, r]), w)],
                       pad_nodes=n_pad, pad_edges=len(s))
    params = model.init(jax.random.key(7), flat)
    ref_logits = model.apply(params, flat)  # [1, C]
    mesh = make_mesh(N_DEV, axis="n")
    fwd = make_sharded_topk_model_forward(
        model, mesh, rows_per=rows_per, max_nodes=flat.max_nodes, axis="n")
    with mesh:
        args = device_put_sharded_dense(mesh, x_pad, mask, S, R, W,
                                        axis="n")
        logits = fwd(params, *args)
    return np.asarray(logits), np.asarray(ref_logits)[0], params, model, flat


@pytest.mark.parametrize("alias", ["topk", "sag"])
def test_sharded_model_logits_match_single_device(alias):
    if len(jax.devices()) < N_DEV:
        pytest.skip("needs 8 virtual devices")
    logits, ref, *_ = _setup(alias)
    np.testing.assert_allclose(logits, ref, rtol=1e-4, atol=1e-5)


def test_sharded_model_multiplier_and_int_ratio():
    if len(jax.devices()) < N_DEV:
        pytest.skip("needs 8 virtual devices")
    logits, ref, *_ = _setup("topk", seed=3, multiplier=1.7, ratio=10)
    np.testing.assert_allclose(logits, ref, rtol=1e-4, atol=1e-5)


def test_sharded_model_gradients_match():
    """Training contract: gradients w.r.t. the ONE parameter tree (incl.
    the pooler's selector projection) agree between layouts."""
    if len(jax.devices()) < N_DEV:
        pytest.skip("needs 8 virtual devices")
    n = 48
    x, s, r, w = _random_graph(n, 160, seed=5)
    pooler = get_pooler("topk", in_channels=16, ratio=0.5)
    model = TopkPoolModel(pooler=pooler, hidden=16, num_classes=3)
    (x_pad, mask, S, R, W, n_pad,
     rows_per) = prepare_sharded_dense_graph(x, s, r, w, n, N_DEV)
    flat = from_graphs([(x, np.stack([s, r]), w)],
                       pad_nodes=n_pad, pad_edges=len(s))
    params = model.init(jax.random.key(2), flat)
    y = jnp.asarray([1])

    def ref_loss(p):
        import optax

        return optax.softmax_cross_entropy_with_integer_labels(
            model.apply(p, flat), y).mean()

    g_ref = jax.grad(ref_loss)(params)

    mesh = make_mesh(N_DEV, axis="n")
    fwd = make_sharded_topk_model_forward(
        model, mesh, rows_per=rows_per, max_nodes=flat.max_nodes, axis="n")
    with mesh:
        args = device_put_sharded_dense(mesh, x_pad, mask, S, R, W,
                                        axis="n")

        def sh_loss(p):
            import optax

            return optax.softmax_cross_entropy_with_integer_labels(
                fwd(p, *args)[None], y).mean()

        g_sh = jax.grad(sh_loss)(params)

    # the selector projection must receive gradient (selection is used)
    sel = g_ref["params"]["pooler"]["selector"]["weight"]
    assert float(jnp.abs(sel).sum()) > 0
    for (ka, va), (kb, vb) in zip(
            jax.tree_util.tree_leaves_with_path(g_ref),
            jax.tree_util.tree_leaves_with_path(g_sh)):
        np.testing.assert_allclose(np.asarray(vb), np.asarray(va),
                                   rtol=3e-4, atol=1e-6, err_msg=str(ka))


def test_unsupported_pooler_rejected():
    mesh = make_mesh(1, axis="n")
    model = TopkPoolModel(pooler=get_pooler("mincut", in_channels=16, k=4),
                          hidden=16)
    with pytest.raises(NotImplementedError):
        make_sharded_topk_model_forward(model, mesh, rows_per=8,
                                        max_nodes=8)
