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
