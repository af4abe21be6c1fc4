"""Branch tests for the NDP level function and Kron reduction
(reference behaviors: tgp/select/ndp_select.py:21-259,
tgp/connect/kron_conn.py:117-168)."""

import numpy as np
import scipy.sparse as sp

from tgp_tpu.precoarsen.common import laplacian_csr
from tgp_tpu.precoarsen.ndp import kron_reduction, ndp_level


def _ring(n):
    s = np.arange(n)
    ei = np.stack([np.concatenate([s, (s + 1) % n]),
                   np.concatenate([(s + 1) % n, s])]).astype(np.int64)
    return ei


def test_kron_reduction_single_positive_node():
    L, _ = laplacian_csr(_ring(4), 4, None)
    A = kron_reduction(L, idx_pos=[0], idx_neg=[1, 2, 3])
    assert A.shape == (1, 1)
    assert A.nnz == 0  # diagonal zeroed


def test_kron_reduction_no_negative_side():
    L, _ = laplacian_csr(_ring(5), 5, None)
    A = kron_reduction(L, idx_pos=list(range(5)), idx_neg=[])
    # no reduction: A_pool = -L off-diagonal = original adjacency
    assert A.shape == (5, 5)
    assert A.nnz == 10  # ring edges, both directions


def test_kron_reduction_singular_complement_damped():
    # isolated node in the negative side -> L_comp singular -> ML damping
    ei = _ring(4)
    s = np.concatenate([ei[0], [4, 4]])  # node 4 isolated (self edges only)
    r = np.concatenate([ei[1], [4, 4]])
    L, _ = laplacian_csr(np.stack([s, r]).astype(np.int64), 5, None)
    A = kron_reduction(L, idx_pos=[0, 1, 2], idx_neg=[3, 4])
    assert A.shape == (3, 3)
    assert np.isfinite(A.toarray()).all()


def test_ndp_level_trivial_graphs():
    out1 = ndp_level(np.zeros((2, 0), np.int64), 1)
    assert out1["num_clusters"] == 1
    assert out1["cluster_index"][0] == 0
    # two nodes, one edge: eigvec splits them; one side kept
    ei = np.array([[0, 1], [1, 0]], np.int64)
    out2 = ndp_level(ei, 2)
    assert out2["num_clusters"] in (1, 2)
    assert (out2["cluster_index"] >= -1).all()


def test_ndp_level_low_cut_random_fallback():
    # complete graph K6: every balanced sign partition has cut fraction
    # 9/(2*15) = 0.3 < 0.5 -> the seeded random fallback path runs
    n = 6
    s, r = np.nonzero(~np.eye(n, dtype=bool))
    out = ndp_level(np.stack([s, r]).astype(np.int64), n, seed=3)
    ci = out["cluster_index"]
    k = out["num_clusters"]
    assert 1 <= k < n
    assert (np.sort(np.unique(ci[ci >= 0])) == np.arange(k)).all()


def test_ndp_level_deterministic_given_seed():
    rng = np.random.default_rng(0)
    a = np.triu(rng.random((30, 30)) < 0.2, 1)
    adj = a | a.T
    s, r = np.nonzero(adj)
    ei = np.stack([s, r]).astype(np.int64)
    o1 = ndp_level(ei, 30, seed=7)
    o2 = ndp_level(ei, 30, seed=7)
    np.testing.assert_array_equal(o1["cluster_index"], o2["cluster_index"])
