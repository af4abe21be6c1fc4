"""DPSelect stick-breaking properties and global_reduce op matrix
(reference: tgp/select/dp_select.py:113-176; PyG global_*_pool used by the
reference readouts)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.utils_graphs import make_batch
from tgp_tpu.reduce.global_reduce import global_reduce
from tgp_tpu.select.dp import DPSelect, stick_breaking


def test_stick_breaking_is_a_distribution():
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.uniform(0.05, 0.95, size=(7, 5)).astype(np.float32))
    pi = np.asarray(stick_breaking(z))
    assert pi.shape == (7, 6)  # K-1 sticks -> K weights
    assert np.all(pi >= 0)
    np.testing.assert_allclose(pi.sum(-1), 1.0, rtol=1e-5)


def test_stick_breaking_matches_recursive_oracle():
    rng = np.random.default_rng(1)
    z = rng.uniform(0.1, 0.9, size=(4,)).astype(np.float32)
    pi = np.asarray(stick_breaking(jnp.asarray(z)))
    rem, expect = 1.0, []
    for zk in z:
        expect.append(zk * rem)
        rem *= 1 - zk
    expect.append(rem)
    np.testing.assert_allclose(pi, np.asarray(expect), rtol=1e-5)


def test_stick_breaking_degenerate_sticks():
    # z -> 1 concentrates all mass on the first stick; z -> 0 on the last
    pi_first = np.asarray(stick_breaking(jnp.asarray([1.0 - 1e-7, 0.5, 0.5])))
    assert pi_first[0] > 0.999
    pi_last = np.asarray(stick_breaking(jnp.asarray([1e-9, 1e-9, 1e-9])))
    assert pi_last[-1] > 0.999


def _dense_batch():
    from tgp_tpu.graph import to_dense

    batch = make_batch([10, 8], p=0.4, seed=3, num_features=6)
    return batch, to_dense(batch)


def test_dp_select_rows_are_distributions():
    batch, dense = _dense_batch()
    sel = DPSelect(in_channels=6, k=4)
    so, _ = _apply_dp(sel, dense)
    s = np.asarray(so.s)  # [B, Nmax, K]
    ng = np.asarray(batch.node_graph)
    npos = np.asarray(batch.node_pos)
    nm = np.asarray(batch.node_mask)
    rows = s[ng[nm], npos[nm]]
    assert np.all(rows >= 0)
    np.testing.assert_allclose(rows.sum(-1), 1.0, rtol=1e-4)


def _apply_dp(sel, batch):
    rngs = {"params": jax.random.key(0), "sample": jax.random.key(1)}
    params = sel.init(rngs, batch)
    so = sel.apply(params, batch, rngs={"sample": jax.random.key(2)})
    return so, params


def test_dp_select_exposes_posterior_extras():
    _, dense = _dense_batch()
    sel = DPSelect(in_channels=6, k=4)
    so, _ = _apply_dp(sel, dense)
    assert "q_alpha" in so.extras and "q_beta" in so.extras
    assert np.all(np.asarray(so.extras["q_alpha"]) > 0)
    assert np.all(np.asarray(so.extras["q_beta"]) > 0)


def test_dp_select_sampling_is_keyed():
    _, dense = _dense_batch()
    sel = DPSelect(in_channels=6, k=4)
    rngs = {"params": jax.random.key(0), "sample": jax.random.key(1)}
    params = sel.init(rngs, dense)
    s1 = sel.apply(params, dense, rngs={"sample": jax.random.key(5)}).s
    s2 = sel.apply(params, dense, rngs={"sample": jax.random.key(5)}).s
    s3 = sel.apply(params, dense, rngs={"sample": jax.random.key(9)}).s
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    assert not np.allclose(np.asarray(s1), np.asarray(s3))


@pytest.mark.parametrize("op", ["sum", "mean", "max", "min"])
def test_global_reduce_sparse_matches_numpy(op):
    batch = make_batch([9, 7, 11], p=0.4, seed=4, num_features=5)
    out = np.asarray(global_reduce(batch.x, node_graph=batch.node_graph,
                                   num_graphs=3, mask=batch.node_mask,
                                   op=op))
    x = np.asarray(batch.x)
    ng = np.asarray(batch.node_graph)
    nm = np.asarray(batch.node_mask)
    fn = {"sum": np.sum, "mean": np.mean, "max": np.max, "min": np.min}[op]
    for g in range(3):
        rows = x[nm & (ng == g)]
        np.testing.assert_allclose(out[g], fn(rows, axis=0), rtol=1e-5,
                                   atol=1e-6)


def test_global_reduce_dense_mask_excludes_padding():
    rng = np.random.default_rng(5)
    x = rng.normal(size=(2, 6, 3)).astype(np.float32)
    mask = np.array([[1, 1, 1, 0, 0, 0], [1, 1, 1, 1, 1, 1]], bool)
    x[0, 3:] = 1e6  # poison the padding; must not leak
    out = np.asarray(global_reduce(jnp.asarray(x), mask=jnp.asarray(mask),
                                   op="max"))
    np.testing.assert_allclose(out[0], x[0, :3].max(0), rtol=1e-6)
    np.testing.assert_allclose(out[1], x[1].max(0), rtol=1e-6)
