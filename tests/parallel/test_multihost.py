"""Hybrid DCN×ICI mesh parity tests (2 groups × 4 devices on the 8-virtual-
device CPU mesh): the hybrid train step's loss and post-step params must
match a single-device reference of the same math."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tgp_tpu.parallel.multihost import (device_put_hybrid, make_hybrid_mesh,
                                        make_hybrid_pooled_train_step,
                                        stack_group_graphs)
from tgp_tpu.parallel.pooled_model import (init_pooled_params,
                                           prepare_sharded_graph,
                                           reference_pooled_forward)


def _graph(n, seed):
    rng = np.random.default_rng(seed)
    s = rng.integers(0, n, 4 * n).astype(np.int64)
    r = rng.integers(0, n, 4 * n).astype(np.int64)
    keep = s != r
    s, r = np.concatenate([s[keep], r[keep]]), np.concatenate(
        [r[keep], s[keep]])
    x = rng.normal(size=(n, 8)).astype(np.float32)
    return s, r, x


@pytest.fixture(scope="module")
def setup():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_hybrid_mesh(2, 4)
    n_ici = 4
    n = 32 * n_ici
    groups = [_graph(n, seed) for seed in (0, 1)]
    prepped = [prepare_sharded_graph(s, r, None, n, n_ici)
               for s, r, _ in groups]
    S, R, W, n_pad, rows_per = stack_group_graphs(prepped)
    X = jnp.stack([
        jnp.concatenate([jnp.asarray(x),
                         jnp.zeros((n_pad - n, x.shape[1]))])
        for _, _, x in groups])
    y = jnp.asarray([0, 2], jnp.int32)
    params = init_pooled_params(jax.random.key(1), 8, 16, 3, num_levels=2)
    return mesh, groups, (S, R, W), X, y, params, n, n_pad, rows_per


def test_hybrid_step_matches_reference(setup):
    mesh, groups, (S, R, W), X, y, params, n, n_pad, rows_per = setup
    tx = optax.sgd(1e-2)
    opt = tx.init(params)
    step, ks = make_hybrid_pooled_train_step(
        mesh, tx, rows_per=rows_per, n_pad=n_pad, num_valid=n,
        ratio=0.5, num_levels=2)
    args = device_put_hybrid(mesh, X, S, R, W, y)
    params2, opt2, loss = step(params, opt, *args)

    # single-device reference: mean CE over the two groups, same SGD step
    def ref_loss(p):
        ces = []
        for g, (s, r, x) in enumerate(groups):
            x_pad = jnp.concatenate(
                [jnp.asarray(x), jnp.zeros((n_pad - n, x.shape[1]))])
            logits, _ = reference_pooled_forward(
                p, x_pad, jnp.asarray(s), jnp.asarray(r), None, n,
                ks=ks, num_valid=n)
            ces.append(optax.softmax_cross_entropy_with_integer_labels(
                logits[None], y[g][None]).mean())
        return jnp.stack(ces).mean()

    ref_l, ref_g = jax.value_and_grad(ref_loss)(params)
    np.testing.assert_allclose(float(loss), float(ref_l), rtol=2e-4)
    updates, _ = tx.update(ref_g, tx.init(params))
    ref_params = optax.apply_updates(params, updates)
    for k in params:
        np.testing.assert_allclose(
            np.asarray(params2[k]), np.asarray(ref_params[k]),
            rtol=2e-3, atol=2e-5, err_msg=k)


def test_hybrid_two_steps_decrease_loss(setup):
    mesh, groups, (S, R, W), X, y, params, n, n_pad, rows_per = setup
    tx = optax.adam(5e-3)
    opt = tx.init(params)
    step, _ = make_hybrid_pooled_train_step(
        mesh, tx, rows_per=rows_per, n_pad=n_pad, num_valid=n,
        ratio=0.5, num_levels=2)
    args = device_put_hybrid(mesh, X, S, R, W, y)
    losses = []
    for _ in range(3):
        params, opt, loss = step(params, opt, *args)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_stack_group_graphs_validates_padding():
    a = (jnp.zeros((4, 8), jnp.int32), jnp.zeros((4, 8), jnp.int32),
         jnp.zeros((4, 8)), 128, 32)
    b = (jnp.zeros((4, 16), jnp.int32), jnp.zeros((4, 16), jnp.int32),
         jnp.zeros((4, 16)), 256, 64)
    with pytest.raises(ValueError):
        stack_group_graphs([a, b])
    S, R, W, n_pad, rows_per = stack_group_graphs([a, a])
    assert S.shape == (2, 4, 8) and n_pad == 128 and rows_per == 32


def test_make_hybrid_mesh_validates_count():
    with pytest.raises(ValueError):
        make_hybrid_mesh(4, 16)
