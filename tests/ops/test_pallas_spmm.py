"""Pallas sorted-segment-sum kernel tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tgp_tpu.ops.pallas.segment_spmm import sorted_segment_sum_pallas


def _case(N=256, E=2000, F=128, seed=0):
    rng = np.random.default_rng(seed)
    rids = np.sort(rng.integers(0, N, E)).astype(np.int32)
    msgs = rng.normal(size=(E, F)).astype(np.float32)
    row_ptr = np.searchsorted(rids, np.arange(N + 1)).astype(np.int32)
    expect = np.zeros((N, F), np.float32)
    np.add.at(expect, rids, msgs)
    return msgs, rids, row_ptr, expect


def test_sorted_segment_sum_interpret():
    msgs, rids, row_ptr, expect = _case()
    out = sorted_segment_sum_pallas(
        jnp.asarray(msgs), jnp.asarray(rids), jnp.asarray(row_ptr), 256,
        interpret=True)
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-4, atol=1e-4)


def test_skewed_rows_interpret():
    # heavy skew: most edges hit one row
    N, E, F = 128, 1000, 128
    rng = np.random.default_rng(1)
    rids = np.sort(np.concatenate([
        np.full(800, 5), rng.integers(0, N, 200)])).astype(np.int32)
    msgs = rng.normal(size=(E, F)).astype(np.float32)
    row_ptr = np.searchsorted(rids, np.arange(N + 1)).astype(np.int32)
    expect = np.zeros((N, F), np.float32)
    np.add.at(expect, rids, msgs)
    out = sorted_segment_sum_pallas(
        jnp.asarray(msgs), jnp.asarray(rids), jnp.asarray(row_ptr), N,
        interpret=True)
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-3, atol=1e-3)


# ------------------------------------------------------ banded fused kernel
def _banded_case(B=2, n_per=128, F=128, p=0.05, seed=0):
    """Graphs packed per-block so the band contract holds by construction."""
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
    w = rng.uniform(0.5, 2.0, s.shape[0]).astype(np.float32)
    x = rng.normal(size=(N, F)).astype(np.float32)
    row_ptr = np.searchsorted(r, np.arange(N + 1)).astype(np.int32)
    expect = np.zeros((N, F), np.float32)
    np.add.at(expect, r, x[s] * w[:, None])
    return x, s, r, w, row_ptr, expect, N


def test_banded_spmm_interpret():
    from tgp_tpu.ops.pallas.segment_spmm import banded_sorted_spmm_pallas

    x, s, r, w, row_ptr, expect, N = _banded_case()
    out = banded_sorted_spmm_pallas(
        jnp.asarray(x), jnp.asarray(s), jnp.asarray(row_ptr), jnp.asarray(w),
        N, window=256, block_rows=128, block_edges=128, interpret=True,
        precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(out), expect, rtol=2e-2,
                               atol=2e-2)


def test_banded_spmm_grad_interpret():
    """Custom VJP: d/dx matches the XLA scatter SpMM gradient."""
    from tgp_tpu.ops.pallas.segment_spmm import spmm_banded

    x, s, r, w, row_ptr, expect, N = _banded_case(B=1, n_per=128, F=128)
    xj, sj, rj = jnp.asarray(x), jnp.asarray(s), jnp.asarray(r)
    wj, rp = jnp.asarray(w), jnp.asarray(row_ptr)

    def f_pallas(x):
        return jnp.sum(spmm_banded(x, sj, rj, wj, N, window=256,
                                   interpret=True) ** 2)

    def f_ref(x):
        msgs = x[sj] * wj[:, None]
        out = jax.ops.segment_sum(msgs, rj, num_segments=N)
        return jnp.sum(out ** 2)

    g_p = np.asarray(jax.grad(f_pallas)(xj))
    g_r = np.asarray(jax.grad(f_ref)(xj))
    np.testing.assert_allclose(g_p, g_r, rtol=5e-2, atol=5e-2)


def test_check_band_contract():
    from tgp_tpu.ops.pallas.segment_spmm import check_band_contract

    x, s, r, w, row_ptr, expect, N = _banded_case()
    em = np.ones(s.shape[0], bool)
    assert check_band_contract(s, r, em, N, block_rows=128, window=256)
    # violate: an edge from the far end into row block 0
    s2 = s.copy()
    s2[0] = N - 1
    assert not check_band_contract(s2, r, em, N, block_rows=128, window=128)


def test_sorted_segment_sum_bf16_input_interpret():
    """bf16 message input: VMEM scratch must match the HBM dtype (a
    bf16→f32 DMA is a Mosaic element-type mismatch), output comes back
    bf16, values track the f32 oracle at bf16 resolution."""
    msgs, rids, row_ptr, expect = _case()
    out = sorted_segment_sum_pallas(
        jnp.asarray(msgs).astype(jnp.bfloat16), jnp.asarray(rids),
        jnp.asarray(row_ptr), 256, interpret=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32), expect,
                               rtol=3e-2, atol=3e-2)


def test_auto_blocks_selection():
    """Measured-best defaults (exp_kernel_sweep): 256-row blocks when the
    row count allows, 2048-edge chunks for large E within a ~4MB VMEM
    budget, legacy 128/512 otherwise."""
    from tgp_tpu.ops.pallas.segment_spmm import _auto_blocks

    assert _auto_blocks(1 << 20, 128, 65536, 2) == (256, 2048)
    assert _auto_blocks(1 << 20, 128, 65536 + 128, 2) == (128, 2048)
    assert _auto_blocks(1000, 128, 256, 2) == (256, 512)
    # VMEM guard: wide features shrink the edge chunk (multiple of 128)
    br, be = _auto_blocks(1 << 20, 512, 65536, 4)
    assert be * 512 * 4 * 2 <= 4 * 1024 * 1024 and be % 128 == 0
    # VMEM safety beats the 512-edge throughput floor for very wide rows:
    # 512 edges at F=4096 f32 is 16 MB double-buffered (> VMEM)
    be_wide = _auto_blocks(1 << 20, 4096, 65536, 4)[1]
    assert be_wide == 128
    assert be_wide * 4096 * 4 * 2 <= 4 * 1024 * 1024
