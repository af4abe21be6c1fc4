"""The SpMM regime map as code (VERDICT r2 #3): `spmm(method="auto")` and
GCNConv's `use_pallas=None` must route by (E, sortedness, backend) instead
of a hand-set flag — tested right at the regime boundaries."""

import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tgp_tpu.ops import sparse as sp


class _FakeBackend:
    def __init__(self, platform):
        self.platform = platform


@pytest.fixture
def on_tpu(monkeypatch):
    import jax.extend.backend as backend

    monkeypatch.setattr(backend, "get_backend",
                        lambda *a, **k: _FakeBackend("tpu"))


def test_boundary_exact(on_tpu):
    assert not sp.use_pallas_spmm(sp.PALLAS_MIN_EDGES - 1, True)
    assert sp.use_pallas_spmm(sp.PALLAS_MIN_EDGES, True)


def test_unsorted_never_pallas(on_tpu):
    assert not sp.use_pallas_spmm(sp.PALLAS_MIN_EDGES * 4, False)


def test_cpu_never_pallas():
    # real backend in the test env is cpu
    assert not sp.use_pallas_spmm(sp.PALLAS_MIN_EDGES * 4, True)


def test_spmm_forced_methods_agree():
    rng = np.random.default_rng(0)
    n, e, F = 128, 512, 8
    s = jnp.asarray(np.sort(rng.integers(0, n, e)).astype(np.int32))
    r = jnp.asarray(np.sort(rng.integers(0, n, e)).astype(np.int32))
    w = jnp.asarray(rng.normal(size=e).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(n, F)).astype(np.float32))
    out_auto = sp.spmm(s, r, w, x, n, indices_are_sorted=True)
    out_xla = sp.spmm(s, r, w, x, n, indices_are_sorted=True, method="xla")
    np.testing.assert_allclose(np.asarray(out_auto), np.asarray(out_xla),
                               rtol=1e-6)


def test_gcnconv_auto_uses_regime_map(monkeypatch):
    """GCNConv(use_pallas=None) consults use_pallas_spmm with the batch's
    edge count and sortedness."""
    from tests.utils_graphs import make_batch

    calls = []
    real = sp.use_pallas_spmm

    def spy(num_edges, edges_sorted):
        calls.append((num_edges, edges_sorted))
        return real(num_edges, edges_sorted)

    monkeypatch.setattr(sp, "use_pallas_spmm", spy)

    from tgp_tpu.mp.gcn import GCNConv

    b = make_batch([10, 8], num_features=4, seed=0)
    conv = GCNConv(8)
    params = conv.init(jax.random.key(0), b)
    conv.apply(params, b)
    assert calls and calls[0][0] == b.num_edges
