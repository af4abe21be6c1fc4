"""Pallas banded SDDMM kernel tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from tgp_tpu.ops.pallas.sddmm import banded_sddmm_pallas, sddmm_banded
from tgp_tpu.ops.sparse import sddmm as sddmm_xla


def _case(B=2, n_per=128, F=128, p=0.05, seed=0, Fb=None):
    """Graphs packed per-block so both id axes satisfy the band contract."""
    rng = np.random.default_rng(seed)
    N = B * n_per
    s_all, r_all = [], []
    for b in range(B):
        upper = np.triu(rng.random((n_per, n_per)) < p, 1)
        adj = upper | upper.T
        s, r = np.nonzero(adj)
        s_all.append(s + b * n_per)
        r_all.append(r + b * n_per)
    s = np.concatenate(s_all).astype(np.int32)
    r = np.concatenate(r_all).astype(np.int32)
    order = np.argsort(r, kind="stable")
    s, r = s[order], r[order]
    a = rng.normal(size=(N, F)).astype(np.float32)
    b = rng.normal(size=(N, F)).astype(np.float32)
    expect = np.sum(a[s] * b[r], axis=-1)
    return a, b, s, r, expect, N


def test_banded_sddmm_interpret():
    a, b, s, r, expect, N = _case()
    out = banded_sddmm_pallas(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(s), jnp.asarray(r),
        window=256, block_edges=128, interpret=True,
        precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(out), expect, rtol=2e-3, atol=2e-3)


def test_banded_sddmm_matches_xla_lowering():
    a, b, s, r, expect, N = _case(seed=3)
    ref = np.asarray(sddmm_xla(jnp.asarray(s), jnp.asarray(r),
                               jnp.asarray(a), jnp.asarray(b)))
    out = banded_sddmm_pallas(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(s), jnp.asarray(r),
        window=256, block_edges=128, interpret=True,
        precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-3, atol=2e-3)


def test_banded_sddmm_padding_edges_self_mask():
    """Padding edges carrying out-of-range ids must yield exactly 0."""
    a, b, s, r, expect, N = _case(B=1)
    E = s.shape[0]
    s_pad = np.concatenate([s, np.full(37, N, np.int32)])
    r_pad = np.concatenate([r, np.full(37, N, np.int32)])
    out = banded_sddmm_pallas(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(s_pad),
        jnp.asarray(r_pad), window=256, block_edges=128, interpret=True,
        precision=jax.lax.Precision.HIGHEST)
    out = np.asarray(out)
    np.testing.assert_allclose(out[:E], expect, rtol=2e-3, atol=2e-3)
    np.testing.assert_array_equal(out[E:], 0.0)


def test_sddmm_banded_grad_matches_xla():
    """Custom VJP: d/da and d/db match the XLA gather-mul gradient."""
    a, b, s, r, expect, N = _case(B=1, seed=7)
    aj, bj = jnp.asarray(a), jnp.asarray(b)
    sj, rj = jnp.asarray(s), jnp.asarray(r)

    def f_pallas(a, b):
        return jnp.sum(sddmm_banded(a, b, sj, rj, window=256,
                                    interpret=True) ** 2)

    def f_ref(a, b):
        return jnp.sum(sddmm_xla(sj, rj, a, b) ** 2)

    ga_p, gb_p = jax.grad(f_pallas, argnums=(0, 1))(aj, bj)
    ga_r, gb_r = jax.grad(f_ref, argnums=(0, 1))(aj, bj)
    np.testing.assert_allclose(np.asarray(ga_p), np.asarray(ga_r),
                               rtol=5e-2, atol=5e-2)
    np.testing.assert_allclose(np.asarray(gb_p), np.asarray(gb_r),
                               rtol=5e-2, atol=5e-2)
