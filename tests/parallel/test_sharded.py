"""Multi-device parity tests on the 8-virtual-device CPU mesh — the TPU
analogue of the reference's batched-vs-unbatched oracle (SURVEY §4):
sharded == unsharded."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tgp_tpu.ops.sparse import spmm
from tgp_tpu.parallel.spmm import make_sharded_spmm, partition_edges
from tgp_tpu.parallel.train import make_dp_train_step, make_mesh, stack_batches
from tests.utils_graphs import erdos_renyi_graph, make_batch


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(8, axis="gp")


def test_sharded_spmm_matches_single_device(mesh):
    rng = np.random.default_rng(0)
    n, e, F = 64, 400, 16
    s = rng.integers(0, n, e).astype(np.int32)
    r = rng.integers(0, n, e).astype(np.int32)
    w = rng.normal(size=e).astype(np.float32)
    x = rng.normal(size=(n, F)).astype(np.float32)

    expect = np.asarray(spmm(jnp.asarray(s), jnp.asarray(r), jnp.asarray(w),
                             jnp.asarray(x), n))

    S, R, W, n_pad, rows_per = partition_edges(s, r, w, n, 8)
    x_pad = np.zeros((n_pad, F), np.float32)
    x_pad[:n] = x
    fn = make_sharded_spmm(mesh, rows_per, axis="gp")
    with mesh:
        out = fn(jnp.asarray(x_pad), S, R, W)
    np.testing.assert_allclose(np.asarray(out)[:n], expect, rtol=1e-4,
                               atol=1e-4)


def test_dp_train_step_matches_single_device(mesh):
    """DP gradients over 8 devices == single-device gradients on the
    concatenated batch (identical per-device batches ⇒ pmean no-op)."""
    import optax

    from tgp_tpu.models.classifiers import PoolingClassifier
    from tgp_tpu.poolers import get_pooler

    batch = make_batch([6, 9], num_features=4, seed=0)
    y = jnp.asarray(np.array([0, 1]))
    pooler = get_pooler("topk", in_channels=8, ratio=0.5)
    model = PoolingClassifier(pooler=pooler, num_classes=2, hidden=8)
    params = model.init(jax.random.key(0), batch)
    tx = optax.sgd(0.1)
    opt_state = tx.init(params)

    def loss_fn(p, b, yy):
        logits, out = model.apply(p, b)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, yy).mean() + out.loss_sum()

    # single device step
    loss1, grads1 = jax.value_and_grad(loss_fn)(params, batch, y)
    updates, _ = tx.update(grads1, opt_state)
    import optax as _o
    params_single = _o.apply_updates(params, updates)

    # 8-device dp step with identical batches
    step = make_dp_train_step(loss_fn, tx, mesh, axis="gp")
    sb = stack_batches([batch] * 8)
    sy = jnp.stack([y] * 8)
    params_dp, _, loss_dp = step(params, opt_state, sb, sy)

    np.testing.assert_allclose(float(loss_dp), float(loss1), rtol=1e-5)
    for l1, l2 in zip(jax.tree_util.tree_leaves(params_single),
                      jax.tree_util.tree_leaves(params_dp)):
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-4,
                                   atol=1e-5)


def test_ring_halo_spmm_matches(mesh):
    from tgp_tpu.parallel.spmm import make_ring_halo_spmm, partition_edges_2d

    rng = np.random.default_rng(3)
    n, e, F = 64, 400, 16
    s = rng.integers(0, n, e).astype(np.int32)
    r = rng.integers(0, n, e).astype(np.int32)
    w = rng.normal(size=e).astype(np.float32)
    x = rng.normal(size=(n, F)).astype(np.float32)
    expect = np.asarray(spmm(jnp.asarray(s), jnp.asarray(r), jnp.asarray(w),
                             jnp.asarray(x), n))

    S, R, W, n_pad, rows_per = partition_edges_2d(s, r, w, n, 8)
    x_pad = np.zeros((n_pad, F), np.float32)
    x_pad[:n] = x
    fn = make_ring_halo_spmm(mesh, rows_per, 8, axis="gp")
    with mesh:
        out = fn(jnp.asarray(x_pad), S, R, W)
    np.testing.assert_allclose(np.asarray(out)[:n], expect, rtol=1e-4,
                               atol=1e-4)


def test_make_mesh_raises_on_too_few_devices():
    """Silently truncating to the available device count produced a size-1
    mesh whose shard_map ran with partition metadata computed for N devices
    (numerically wrong) — make_mesh must fail loudly instead."""
    with pytest.raises(ValueError, match="only .* visible"):
        make_mesh(len(jax.devices()) + 1)
