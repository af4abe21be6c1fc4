"""RCM locality ordering + banded-SpMM planning (round 3): the TPU answer
to the gather-leg ceiling — bandwidth-reduced graphs ride the fused banded
kernel (no per-edge gather, no [E,F] messages)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tgp_tpu.ops.ordering import (
    apply_node_order,
    band_after_order,
    choose_banded_window,
    locality_spmm,
    plan_locality_spmm,
    rcm_order,
)
from tgp_tpu.ops.sparse import spmm


def _shuffled_grid(rows=16, cols=16, seed=0):
    """2-D grid with randomly permuted labels — high bandwidth before RCM,
    ≤ ~2·cols after."""
    rng = np.random.default_rng(seed)
    n = rows * cols
    lab = rng.permutation(n)
    edges = []
    for i in range(rows):
        for j in range(cols):
            u = i * cols + j
            if j + 1 < cols:
                edges.append((u, u + 1))
            if i + 1 < rows:
                edges.append((u, u + cols))
    e = np.array(edges).T
    ei = np.concatenate([lab[e], lab[e[::-1]]], axis=1)
    return ei, n


def test_rcm_reduces_bandwidth():
    ei, n = _shuffled_grid()
    before = band_after_order(ei, n)
    perm = rcm_order(ei, n)
    after = band_after_order(ei, n, perm)
    assert after < before / 3
    assert after <= 35  # grid bandwidth ~2*cols after RCM


def test_apply_node_order_roundtrip():
    ei, n = _shuffled_grid(8, 8, seed=1)
    x = np.random.default_rng(2).normal(size=(n, 4)).astype(np.float32)
    perm = rcm_order(ei, n)
    x2, ei2, inv = apply_node_order(perm, x, ei)
    np.testing.assert_allclose(x2[inv], x)
    # relabeled edges connect the same feature vectors
    np.testing.assert_allclose(x2[ei2[0][:5]], x[ei[0][:5]])


def test_plan_picks_banded_for_grid_and_matches_xla():
    ei, n = _shuffled_grid(16, 8, seed=3)
    rng = np.random.default_rng(4)
    w = rng.uniform(0.5, 2.0, ei.shape[1]).astype(np.float32)
    x = rng.normal(size=(n, 128)).astype(np.float32)

    plan = plan_locality_spmm(ei, n, w, engine="banded")
    assert plan["engine"] == "banded"
    assert plan["window"] % 128 == 0
    # auto resolves to sorted (measured-best on v5e, see ordering.py)
    assert plan_locality_spmm(ei, n, w)["engine"] == "sorted"

    want = np.asarray(spmm(jnp.asarray(ei[0]), jnp.asarray(ei[1]),
                           jnp.asarray(w), jnp.asarray(x), n))
    out_new = locality_spmm(plan, jnp.asarray(x[plan["perm"]]),
                            interpret=True)
    out = np.asarray(out_new)[plan["inv"]]
    np.testing.assert_allclose(out, want, rtol=2e-2, atol=2e-2)


def test_plan_falls_back_to_sorted_for_random_graph():
    rng = np.random.default_rng(5)
    n, e = 512, 4096
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
    plan = plan_locality_spmm(ei, n, max_window=512)
    assert plan["engine"] == "sorted"
    with pytest.raises(ValueError, match="exceeds max_window"):
        plan_locality_spmm(ei, n, max_window=512, engine="banded")
    x = rng.normal(size=(n, 128)).astype(np.float32)
    out_new = locality_spmm(plan, jnp.asarray(x[plan["perm"]]),
                            interpret=True)
    want = np.asarray(spmm(jnp.asarray(ei[0]), jnp.asarray(ei[1]),
                           jnp.ones(e), jnp.asarray(x), n))
    np.testing.assert_allclose(np.asarray(out_new)[plan["inv"]], want,
                               rtol=2e-2, atol=2e-2)


def test_choose_banded_window_bounds():
    assert choose_banded_window(0) == 256  # block_rows + 8 rounded up
    assert choose_banded_window(100_000) is None


def test_locality_spmm_arbitrary_node_count():
    """Node counts that are not a multiple of the kernel's 128-row block
    must work (ADVICE r3: raw num_rows tripped the alignment assert)."""
    import numpy as np

    from tgp_tpu.ops.ordering import locality_spmm, plan_locality_spmm

    rng = np.random.default_rng(7)
    n, e, f = 200, 900, 8  # 200 % 128 != 0
    ei = rng.integers(0, n, (2, e))
    x = rng.normal(size=(n, f)).astype(np.float32)
    plan = plan_locality_spmm(ei, n)
    x_new = x[plan["perm"]]
    out = np.asarray(locality_spmm(plan, jnp.asarray(x_new), interpret=True))
    assert out.shape == (n, f)
    # oracle: dense A @ x in the plan's node order
    A = np.zeros((n, n), np.float32)
    inv = plan["inv"]
    for s, r in ei.T:
        A[inv[r], inv[s]] += 1.0
    np.testing.assert_allclose(out, A @ x_new, rtol=1e-4, atol=1e-4)


def test_spmm_forced_pallas_requires_sorted():
    """spmm(method='pallas') on unsorted receivers must raise, not return
    silently wrong sums (ADVICE r3)."""
    import numpy as np
    import pytest

    from tgp_tpu.ops.sparse import sort_by_receiver, spmm

    rng = np.random.default_rng(8)
    n, e, f = 64, 256, 4
    s = jnp.asarray(rng.integers(0, n, e).astype(np.int32))
    r = jnp.asarray(rng.integers(0, n, e).astype(np.int32))
    w = jnp.ones(e, jnp.float32)
    x = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    with pytest.raises(ValueError, match="indices_are_sorted"):
        spmm(s, r, w, x, n, method="pallas")
    # sorted input goes through (interpret-mode off-TPU) and matches XLA
    s2, r2, w2 = sort_by_receiver(s, r, w)
    got = spmm(s2, r2, w2, x, n, indices_are_sorted=True, method="pallas")
    ref = spmm(s, r, w, x, n, method="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
