"""Sparse connectivity op tests against dense NumPy oracles."""

import jax.numpy as jnp
import numpy as np

from tgp_tpu.ops import (
    add_remaining_self_loops,
    coalesce,
    normalize_adj_sym,
    rank3_diag,
    rank3_trace,
    remove_self_loops,
    sddmm,
    spmm,
    weighted_degree,
)


def _rand_coo(n=12, e=40, seed=0, dup=True):
    rng = np.random.default_rng(seed)
    s = rng.integers(0, n, e).astype(np.int32)
    r = rng.integers(0, n, e).astype(np.int32)
    w = rng.normal(size=e).astype(np.float32)
    m = rng.random(e) > 0.2
    w = np.where(m, w, 0.0).astype(np.float32)
    return s, r, w, m


def _to_dense(s, r, w, m, n):
    a = np.zeros((n, n), np.float32)
    for i in range(len(s)):
        if m[i]:
            a[s[i], r[i]] += w[i]
    return a


def test_coalesce_sum():
    n = 12
    s, r, w, m = _rand_coo(n=n)
    dense = _to_dense(s, r, w, m, n)
    so, ro, wo, mo = coalesce(
        jnp.asarray(s), jnp.asarray(r), jnp.asarray(w), jnp.asarray(m), n
    )
    so, ro, wo, mo = map(np.asarray, (so, ro, wo, mo))
    out = _to_dense(so, ro, wo, mo, n)
    np.testing.assert_allclose(out, dense, rtol=1e-5, atol=1e-5)
    # each (s, r) pair appears at most once among valid slots
    pairs = set()
    for i in range(len(so)):
        if mo[i]:
            assert (so[i], ro[i]) not in pairs
            pairs.add((so[i], ro[i]))
    assert np.all(wo[~mo] == 0)


def test_spmm_matches_dense():
    n = 12
    s, r, w, m = _rand_coo(n=n)
    x = np.random.default_rng(1).normal(size=(n, 5)).astype(np.float32)
    a = _to_dense(s, r, w, m, n)
    out = spmm(jnp.asarray(s), jnp.asarray(r), jnp.asarray(w), jnp.asarray(x), n)
    np.testing.assert_allclose(np.asarray(out), a.T @ x, rtol=1e-4, atol=1e-4)


def test_sddmm():
    n, e = 10, 25
    rng = np.random.default_rng(3)
    s = rng.integers(0, n, e)
    r = rng.integers(0, n, e)
    a = rng.normal(size=(n, 4)).astype(np.float32)
    b = rng.normal(size=(n, 4)).astype(np.float32)
    out = np.asarray(sddmm(jnp.asarray(s), jnp.asarray(r), jnp.asarray(a), jnp.asarray(b)))
    expect = np.array([a[s[i]] @ b[r[i]] for i in range(e)])
    np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-5)


def test_self_loops_roundtrip():
    n = 8
    s = np.array([0, 1, 2, 2, 3], np.int32)
    r = np.array([1, 0, 2, 3, 3], np.int32)
    w = np.ones(5, np.float32)
    m = np.ones(5, bool)
    nm = np.ones(n, bool)
    nm[6:] = False
    so, ro, wo, mo = remove_self_loops(
        jnp.asarray(s), jnp.asarray(r), jnp.asarray(w), jnp.asarray(m)
    )
    assert not np.any(np.asarray(mo) & (np.asarray(so) == np.asarray(ro)))
    s2, r2, w2, m2 = add_remaining_self_loops(
        jnp.asarray(s), jnp.asarray(r), jnp.asarray(w), jnp.asarray(m),
        jnp.asarray(nm), fill_value=2.0,
    )
    s2, r2, w2, m2 = map(np.asarray, (s2, r2, w2, m2))
    dense = _to_dense(s2, r2, w2, m2, n)
    # node 2 already had a self loop with weight 1; others get 2.0
    assert dense[2, 2] == 1.0
    for i in [0, 1, 4, 5]:
        assert dense[i, i] == 2.0
    # masked-out nodes get no loop
    assert dense[6, 6] == 0.0 and dense[7, 7] == 0.0


def test_weighted_degree_and_sym_norm():
    n = 10
    s, r, w, m = _rand_coo(n=n, seed=5)
    w = np.abs(w).astype(np.float32)
    a = _to_dense(s, r, w, m, n)
    deg = np.asarray(weighted_degree(jnp.asarray(r), jnp.asarray(w), n, mask=jnp.asarray(m)))
    np.testing.assert_allclose(deg, a.sum(0), rtol=1e-5, atol=1e-5)
    wn = np.asarray(normalize_adj_sym(
        jnp.asarray(s), jnp.asarray(r), jnp.asarray(w), jnp.asarray(m), n))
    an = _to_dense(s, r, wn, m, n)
    d = a.sum(0)
    dinv = np.where(d > 0, 1 / np.sqrt(np.maximum(d, 1e-12)), 0)
    np.testing.assert_allclose(an, dinv[:, None] * a * dinv[None, :], rtol=1e-4, atol=1e-5)


def test_rank3_helpers():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(3, 5, 5)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(rank3_trace(jnp.asarray(x))), np.trace(x, axis1=1, axis2=2),
        rtol=1e-5,
    )
    v = rng.normal(size=(3, 5)).astype(np.float32)
    d = np.asarray(rank3_diag(jnp.asarray(v)))
    for b in range(3):
        np.testing.assert_allclose(d[b], np.diag(v[b]), rtol=1e-6)
