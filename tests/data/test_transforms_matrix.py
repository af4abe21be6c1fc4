"""Transform behavioral matrix (reference tgp/data/transforms.py:30-181):
NormalizeAdj spectral identity + self-loop merge + delta knob; SortNodes
ascending/descending/weighted/missing-y; GraphBatch API surface."""

from __future__ import annotations

import numpy as np
import pytest

from tgp_tpu.data.transforms import NormalizeAdj, SortNodes


def _graph(seed=0, n=10):
    rng = np.random.default_rng(seed)
    upper = np.triu(rng.random((n, n)) < 0.4, k=1)
    adj = upper | upper.T
    s, r = np.nonzero(adj)
    x = rng.normal(size=(n, 3)).astype(np.float32)
    return x, np.stack([s, r])


def test_normalize_adj_matches_dense_formula():
    x, ei = _graph(0)
    n = x.shape[0]
    delta = 0.7
    x2, ei2, w2 = NormalizeAdj(delta=delta)((x, ei))
    A = np.zeros((n, n))
    A[ei[0], ei[1]] = 1.0
    deg = A.sum(1)
    dinv = np.where(deg > 0, deg ** -0.5, 0.0)
    want = delta * (dinv[:, None] * A * dinv[None, :]) + (
        1 - delta) * np.eye(n)
    got = np.zeros((n, n))
    got[ei2[0], ei2[1]] = w2
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_normalize_adj_merges_existing_self_loops():
    x = np.ones((3, 2), np.float32)
    ei = np.array([[0, 1, 0], [1, 0, 0]])  # existing (0,0) loop
    x2, ei2, w2 = NormalizeAdj(delta=0.5)((x, ei))
    keys = list(zip(ei2[0].tolist(), ei2[1].tolist()))
    assert len(keys) == len(set(keys))  # coalesced — no duplicate (0,0)


def test_normalize_adj_spectrum_bounded():
    """I − δ·L_sym has eigenvalues in [1−2δ, 1]."""
    x, ei = _graph(3, n=14)
    _, ei2, w2 = NormalizeAdj(delta=0.85)((x, ei))
    n = x.shape[0]
    P = np.zeros((n, n))
    P[ei2[0], ei2[1]] = w2
    ev = np.linalg.eigvalsh((P + P.T) / 2)
    assert ev.max() <= 1.0 + 1e-6
    assert ev.min() >= 1 - 2 * 0.85 - 1e-6


@pytest.mark.parametrize("descending", [False, True])
def test_sort_nodes_orders_and_remaps(descending):
    x, ei = _graph(1)
    y = np.random.default_rng(2).integers(0, 3, x.shape[0])
    w = np.ones(ei.shape[1], np.float32)
    # SortNodes consumes 4-tuples (x, ei, ew, y) — position 2 is WEIGHTS
    x2, ei2, _, y2 = SortNodes(descending=descending)((x, ei, w, y))
    expect = np.sort(y)[::-1] if descending else np.sort(y)
    np.testing.assert_array_equal(y2, expect)
    # edges connect the same feature vectors after the relabel
    for k in range(min(5, ei.shape[1])):
        a_old = x[ei[0][k]]
        a_new = x2[ei2[0][k]]
        np.testing.assert_allclose(a_old, a_new)


def test_sort_nodes_keeps_weights():
    x, ei = _graph(4)
    w = np.random.default_rng(5).uniform(0.5, 2, ei.shape[1]).astype(
        np.float32)
    y = np.arange(x.shape[0]) % 2
    out = SortNodes()((x, ei, w, y))
    assert len(out) == 4
    np.testing.assert_array_equal(np.sort(out[2]), np.sort(w))


def test_sort_nodes_requires_labels():
    x, ei = _graph(6)
    with pytest.raises(ValueError, match="labels"):
        SortNodes()((x, ei))


def test_resolve_activation_matrix():
    import jax.numpy as jnp

    from tgp_tpu.utils.activations import resolve_activation

    v = jnp.asarray([-1.0, 0.0, 2.0])
    assert np.allclose(np.asarray(resolve_activation(None)(v)), [-1, 0, 2])
    assert np.allclose(np.asarray(resolve_activation("relu")(v)), [0, 0, 2])
    # case-insensitive
    assert np.allclose(np.asarray(resolve_activation("ReLU")(v)), [0, 0, 2])
    # callables pass through
    f = resolve_activation(lambda t: t * 2)
    assert np.allclose(np.asarray(f(v)), [-2, 0, 4])
    with pytest.raises(ValueError, match="unknown activation"):
        resolve_activation("not_an_act")


def test_graphbatch_api_surface():
    import jax.numpy as jnp

    from tgp_tpu.graph import from_graphs

    x, ei = _graph(7, n=6)
    b = from_graphs([(x, ei), (x, ei)])
    np.testing.assert_array_equal(np.asarray(b.nodes_per_graph()), [6, 6])
    assert b.num_features == 3
    assert b.num_graphs == 2
    b2 = b.replace(x=jnp.zeros_like(b.x))
    assert float(jnp.abs(b2.x).sum()) == 0.0
    assert b2.num_nodes == b.num_nodes  # metadata preserved
