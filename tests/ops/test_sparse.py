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


def test_coalesce_reduce_modes():
    """sum / max / mean reductions over duplicate (s, r) runs."""
    from tgp_tpu.ops.sparse import coalesce

    s = jnp.asarray([0, 0, 0, 1, 2], jnp.int32)
    r = jnp.asarray([1, 1, 2, 2, 0], jnp.int32)
    w = jnp.asarray([1.0, 3.0, 5.0, 7.0, 9.0])
    m = jnp.ones(5, bool)
    for red, expect01 in (("sum", 4.0), ("max", 3.0), ("mean", 2.0)):
        ss, rr, ww, mm = coalesce(s, r, w, m, 3, reduce=red)
        lut = {(int(a), int(b)): float(v)
               for a, b, v, k in zip(ss, rr, ww, mm) if k}
        assert lut[(0, 1)] == expect01, red
        assert lut[(0, 2)] == 5.0 and lut[(1, 2)] == 7.0 and lut[(2, 0)] == 9.0
        assert int(np.asarray(mm).sum()) == 4


def test_coalesce_masked_edges_ignored():
    from tgp_tpu.ops.sparse import coalesce

    s = jnp.asarray([0, 0, 1], jnp.int32)
    r = jnp.asarray([1, 1, 0], jnp.int32)
    w = jnp.asarray([1.0, 100.0, 2.0])
    m = jnp.asarray([True, False, True])  # the 100 is padding
    _, _, ww, mm = coalesce(s, r, w, m, 2)
    valid = np.asarray(ww)[np.asarray(mm)]
    assert 100.0 not in valid.tolist()
    assert sorted(valid.tolist()) == [1.0, 2.0]


def test_add_remaining_self_loops_fill_and_existing():
    from tgp_tpu.ops.sparse import add_remaining_self_loops

    s = jnp.asarray([0, 1, 1], jnp.int32)
    r = jnp.asarray([1, 0, 1], jnp.int32)  # (1,1) loop exists with w=5
    w = jnp.asarray([1.0, 1.0, 5.0])
    em = jnp.ones(3, bool)
    nm = jnp.asarray([True, True, False])  # node 2 is padding
    ss, rr, ww, mm = add_remaining_self_loops(s, r, w, em, nm, fill_value=7.0)
    loops = {int(a): float(v) for a, b, v, k in zip(ss, rr, np.asarray(ww),
                                                    np.asarray(mm))
             if k and int(a) == int(b)}
    assert loops[0] == 7.0   # filled
    assert loops[1] == 5.0   # kept original weight
    assert 2 not in loops    # padding node gets no loop


def test_postprocess_sparse_prune_eps_filters_tiny_weights():
    """reference test_ops.py:254-271: ε-pruning drops |w| ≤ eps."""
    from tgp_tpu.ops.sparse import postprocess_adj_sparse

    s = jnp.asarray([0, 1, 2, 0], jnp.int32)
    r = jnp.asarray([1, 2, 0, 2], jnp.int32)
    w = jnp.asarray([0.5, 1e-4, -0.8, 1e-5])
    m = jnp.ones(4, bool)
    ng = jnp.zeros(3, jnp.int32)
    _, _, ww, mm = postprocess_adj_sparse(
        s, r, w, m, ng, 3, 1, remove_self_loops_flag=False, prune_eps=1e-3)
    kept = np.asarray(ww)[np.asarray(mm)]
    np.testing.assert_allclose(sorted(kept.tolist()), [-0.8, 0.5], rtol=1e-6)


def test_postprocess_sparse_edge_weight_norm_per_graph():
    from tgp_tpu.ops.sparse import postprocess_adj_sparse

    # two graphs: nodes 0-1 (graph 0, max |w| 4), nodes 2-3 (graph 1, max 8)
    s = jnp.asarray([0, 1, 2, 3], jnp.int32)
    r = jnp.asarray([1, 0, 3, 2], jnp.int32)
    w = jnp.asarray([4.0, -2.0, 8.0, 1.0])
    m = jnp.ones(4, bool)
    ng = jnp.asarray([0, 0, 1, 1], jnp.int32)
    _, _, ww, mm = postprocess_adj_sparse(
        s, r, w, m, ng, 4, 2, remove_self_loops_flag=False,
        edge_weight_norm=True)
    out = np.asarray(ww)
    np.testing.assert_allclose(out, [1.0, -0.5, 1.0, 0.125])
