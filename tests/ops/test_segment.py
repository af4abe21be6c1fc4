"""Segment-op unit tests against NumPy oracles."""

import jax.numpy as jnp
import numpy as np
import pytest

from tgp_tpu.ops import (
    segment_count,
    segment_max,
    segment_mean,
    segment_min,
    segment_softmax,
    segment_sum,
    segment_topk_rank,
)


@pytest.fixture
def data():
    rng = np.random.default_rng(0)
    n, s = 40, 5
    vals = rng.normal(size=(n, 3)).astype(np.float32)
    seg = rng.integers(0, s, size=n).astype(np.int32)
    mask = rng.random(n) > 0.25
    return vals, seg, mask, s


def test_segment_sum_masked(data):
    vals, seg, mask, s = data
    out = segment_sum(jnp.asarray(vals), jnp.asarray(seg), s, mask=jnp.asarray(mask))
    expect = np.zeros((s, 3), np.float32)
    for i in range(len(seg)):
        if mask[i]:
            expect[seg[i]] += vals[i]
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-5, atol=1e-5)


def test_segment_mean_count(data):
    vals, seg, mask, s = data
    mean = segment_mean(jnp.asarray(vals), jnp.asarray(seg), s, mask=jnp.asarray(mask))
    cnt = segment_count(jnp.asarray(seg), s, mask=jnp.asarray(mask))
    for g in range(s):
        sel = (seg == g) & mask
        assert int(cnt[g]) == int(sel.sum())
        if sel.sum():
            np.testing.assert_allclose(
                np.asarray(mean[g]), vals[sel].mean(0), rtol=1e-5, atol=1e-5
            )


def test_segment_max_min(data):
    vals, seg, mask, s = data
    v1 = vals[:, 0]
    mx = segment_max(jnp.asarray(v1), jnp.asarray(seg), s, mask=jnp.asarray(mask))
    mn = segment_min(jnp.asarray(v1), jnp.asarray(seg), s, mask=jnp.asarray(mask))
    for g in range(s):
        sel = (seg == g) & mask
        if sel.sum():
            assert np.isclose(float(mx[g]), v1[sel].max())
            assert np.isclose(float(mn[g]), v1[sel].min())


def test_segment_softmax(data):
    vals, seg, mask, s = data
    v1 = vals[:, 0]
    p = np.asarray(
        segment_softmax(jnp.asarray(v1), jnp.asarray(seg), s, mask=jnp.asarray(mask))
    )
    for g in range(s):
        sel = (seg == g) & mask
        if sel.sum():
            e = np.exp(v1[sel] - v1[sel].max())
            np.testing.assert_allclose(p[sel], e / e.sum(), rtol=1e-5, atol=1e-6)
    assert np.allclose(p[~mask], 0.0)


def test_segment_topk_rank(data):
    vals, seg, mask, s = data
    v1 = vals[:, 0]
    rank = np.asarray(
        segment_topk_rank(jnp.asarray(v1), jnp.asarray(seg), s, mask=jnp.asarray(mask))
    )
    for g in range(s):
        sel = np.where((seg == g) & mask)[0]
        order = sel[np.argsort(-v1[sel], kind="stable")]
        for r, idx in enumerate(order):
            assert rank[idx] == r
        # masked elements rank after all valid ones in their segment
        inval = np.where((seg == g) & ~mask)[0]
        for idx in inval:
            assert rank[idx] >= len(sel)


def test_segment_softmax_fully_masked_segment_is_zero():
    """A segment whose members are all masked yields 0s, not NaN
    (softmax of an empty set)."""
    from tgp_tpu.ops.segment import segment_softmax

    x = jnp.asarray([1.0, 2.0, 3.0, 4.0])
    seg = jnp.asarray([0, 0, 1, 1])
    mask = jnp.asarray([True, True, False, False])
    sm = np.asarray(segment_softmax(x, seg, 2, mask=mask))
    assert np.isfinite(sm).all()
    np.testing.assert_allclose(sm[2:], 0.0)
    np.testing.assert_allclose(sm[:2].sum(), 1.0, rtol=1e-6)


def test_segment_normalize_max_abs(data):
    from tgp_tpu.ops.segment import segment_normalize

    vals, seg, mask, s = data
    v = jnp.asarray(vals[:, 0])
    out = np.asarray(segment_normalize(v, jnp.asarray(seg), s,
                                       mask=jnp.asarray(mask)))
    for g in range(s):
        sel = mask & (seg == g)
        if sel.any():
            mx = np.abs(vals[sel, 0]).max()
            np.testing.assert_allclose(out[sel], vals[sel, 0] / mx,
                                       rtol=1e-5)
    # masked entries pass through unchanged
    np.testing.assert_allclose(out[~mask], vals[~mask, 0], rtol=1e-6)


def test_segment_normalize_sum_and_unknown_ord(data):
    from tgp_tpu.ops.segment import segment_normalize

    vals, seg, mask, s = data
    v = jnp.abs(jnp.asarray(vals[:, 0])) + 0.1
    out = np.asarray(segment_normalize(v, jnp.asarray(seg), s,
                                       mask=jnp.asarray(mask), ord="sum"))
    for g in range(s):
        sel = mask & (seg == g)
        if sel.any():
            np.testing.assert_allclose(out[sel].sum(), 1.0, rtol=1e-5)
    with pytest.raises(ValueError, match="unknown ord"):
        segment_normalize(v, jnp.asarray(seg), s, ord="bogus")


def test_segment_min_max_initial_values_on_empty_segment():
    """A segment with no (valid) members returns the neutral init, not
    garbage — the guard masked static-shape code relies on."""
    v = jnp.asarray([1.0, 2.0])
    seg = jnp.asarray([0, 0], jnp.int32)
    mx = np.asarray(segment_max(v, seg, 3))
    mn = np.asarray(segment_min(v, seg, 3))
    assert mx[0] == 2.0 and mn[0] == 1.0
    assert np.isfinite(mx[1:]).all() or (mx[1:] <= mn[0]).all()


def test_segment_topk_rank_ties_stable(data):
    """Equal scores rank by index order (stable), matching the reference's
    deterministic perm construction."""
    seg = jnp.asarray([0, 0, 0, 0], jnp.int32)
    scores = jnp.asarray([1.0, 1.0, 1.0, 1.0])
    rank = np.asarray(segment_topk_rank(scores, seg, 1))
    assert sorted(rank.tolist()) == [0, 1, 2, 3]
    np.testing.assert_array_equal(rank, [0, 1, 2, 3])
