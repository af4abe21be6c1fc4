"""Miscellaneous behavioral branches (round-3 depth pass): kron
sparsification threshold, PyGSP structural invariants, eigenpool reduce
mode handling, checkpoint round-trips with extra state, cheatsheet
consistency with the live registry."""

from __future__ import annotations

import numpy as np
import pytest


# ---------------------------------------------------------------------------
# Kron connect: sparsification threshold knob (ref test_kron_conn.py:258)
# ---------------------------------------------------------------------------


def test_kron_sparse_threshold_drops_small_entries():
    import scipy.sparse as sp

    from tgp_tpu.precoarsen.ndp import kron_reduction

    rng = np.random.default_rng(0)
    n = 12
    upper = np.triu(rng.random((n, n)) < 0.5, k=1)
    W = (upper | upper.T).astype(np.float64)
    L = sp.csgraph.laplacian(sp.csr_matrix(W))
    pos = list(range(0, n, 2))
    neg = list(range(1, n, 2))
    dense_full = np.abs(kron_reduction(L, pos, neg,
                                       sparse_threshold=0.0).toarray())
    dense_cut = np.abs(kron_reduction(L, pos, neg,
                                      sparse_threshold=0.3).toarray())
    assert (dense_full > 0).sum() >= (dense_cut > 0).sum()
    # everything surviving the threshold is above it
    assert (dense_cut[dense_cut > 0] > 0.3).all()


# ---------------------------------------------------------------------------
# PyGSP structural invariants beyond "it builds"
# ---------------------------------------------------------------------------


def test_pygsp_ring_is_2_regular():
    from tgp_tpu.datasets.pygsp import pygsp_graph

    x, ei, w, y = pygsp_graph("Ring", n=20, seed=0)
    deg = np.bincount(ei[0], minlength=20)
    np.testing.assert_array_equal(deg, 2)


def test_pygsp_grid_has_corner_degree_2():
    from tgp_tpu.datasets.pygsp import pygsp_graph

    x, ei, w, y = pygsp_graph("Grid2d", n=16, seed=0)  # 4x4
    deg = np.bincount(ei[0], minlength=16)
    assert sorted(np.unique(deg)) == [2, 3, 4]


def test_pygsp_unavailable_raises_like_reference():
    from tgp_tpu.datasets.pygsp import pygsp_graph

    with pytest.raises((ValueError, ImportError, KeyError)):
        pygsp_graph("Minnesota", n=100, seed=0)


def test_pygsp_symmetric_weights():
    from tgp_tpu.datasets.pygsp import pygsp_graph

    x, ei, w, y = pygsp_graph("Sensor", n=30, seed=2)
    lut = {(a, b): ww for a, b, ww in zip(ei[0], ei[1], w)}
    for (a, b), ww in lut.items():
        assert (b, a) in lut and abs(lut[(b, a)] - ww) < 1e-6


# ---------------------------------------------------------------------------
# Eigenpool reduce: mode-major layout + static num_modes branch
# ---------------------------------------------------------------------------


def test_eigenpool_reduce_mode_major_width():
    """Mode-major pooled width = num_modes · F through the pooler's own
    select output (reduce reads H from SelectOutput.num_modes)."""
    import jax

    from tgp_tpu.poolers import get_pooler
    from tests.utils_graphs import make_batch

    batch = make_batch([10, 8], num_features=4, seed=3)
    pooler = get_pooler("eigen", num_modes=3)
    params = pooler.init(jax.random.key(0), batch)
    out = pooler.apply(params, batch)
    assert out.x.shape[-1] == 3 * 4  # H·F
    assert np.isfinite(np.asarray(out.x)).all()


# ---------------------------------------------------------------------------
# Checkpoint: roundtrip with optimizer state and step counter
# ---------------------------------------------------------------------------


def test_checkpoint_roundtrip_with_opt_state(tmp_path):
    import jax
    import jax.numpy as jnp
    import optax

    from tgp_tpu.utils.checkpoint import restore_params, save_params

    params = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.zeros(3)}
    tx = optax.adam(1e-3)
    opt = tx.init(params)
    _, opt = tx.update(jax.tree.map(jnp.ones_like, params), opt)
    state = {"params": params, "opt": opt, "step": jnp.asarray(7)}
    save_params(str(tmp_path / "ck"), state)
    restored = restore_params(str(tmp_path / "ck"), like=state)
    np.testing.assert_allclose(np.asarray(restored["params"]["w"]),
                               np.arange(6.0).reshape(2, 3))
    assert int(restored["step"]) == 7
    flat_a = jax.tree.leaves(opt)
    flat_b = jax.tree.leaves(restored["opt"])
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


# ---------------------------------------------------------------------------
# Cheatsheet stays in sync with the registry
# ---------------------------------------------------------------------------


def test_cheatsheet_covers_registry():
    from tgp_tpu.poolers import pooler_map
    from tgp_tpu.utils.cheatsheet import cheatsheet_rows, render_cheatsheet

    listed = {row["alias"] for row in cheatsheet_rows()}
    for alias in pooler_map():
        assert alias in listed, f"{alias} missing from cheatsheet"
    text = render_cheatsheet()
    assert "topk" in text and "mincut" in text
