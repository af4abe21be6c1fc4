"""Graclus matching-weight quality bound (VERDICT r2 #4c).

The reference's matcher is randomized (tgp/select/graclus_select.py:67-69 →
``torch_cluster.graclus_cluster``: random-permutation vertex scan, each
unmatched vertex pairs with its heaviest unmatched neighbor), so exact
output equality is undefined.  The quantified bound instead: on seeded
weighted graphs, the total matched edge weight of

  (a) our deterministic weight-ranked device matching
      (tgp_tpu/select/graclus.py), and
  (b) the C++ host matcher (tgp_tpu/_native),

must be ≥ the MEAN matched weight of the reference algorithm transcribed
into NumPy (scripts/ref_oracle.py::graclus_matching_randomized) over 20
random vertex orders — i.e. our deterministic choice is at least as good as
the reference's expected behavior, on every graph tested.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent.parent / "scripts"))
import ref_oracle as oracle  # noqa: E402

from tgp_tpu.graph import GraphBatch, from_graphs  # noqa: E402
from tgp_tpu.select.graclus import graclus_select  # noqa: E402
from tests.utils_graphs import erdos_renyi_graph  # noqa: E402

N_ORACLE_RUNS = 20


def _weighted_graph(seed, n=40, p=0.15):
    x, ei = erdos_renyi_graph(n, p, seed=seed)
    rng = np.random.default_rng(seed + 1000)
    s, r = ei[0], ei[1]
    # symmetric positive weights keyed on the undirected pair
    key = np.minimum(s, r) * n + np.maximum(s, r)
    w = rng.gamma(2.0, 1.0, size=n * n)[key]
    return (x, ei, w.astype(np.float32)), s, r, w


def _oracle_mean_weight(ei, n, w):
    weights = [
        oracle.matching_weight(
            oracle.graclus_matching_randomized(ei, n, w, rng=run), ei, w)
        for run in range(N_ORACLE_RUNS)
    ]
    return float(np.mean(weights)), float(np.max(weights))


@pytest.mark.parametrize("seed", range(8))
def test_device_matching_weight_beats_reference_mean(seed):
    g, s, r, w = _weighted_graph(seed)
    n = g[0].shape[0]
    ei = np.stack([s, r])
    mean_w, max_w = _oracle_mean_weight(ei, n, w)

    batch = from_graphs([g])
    so = graclus_select(batch)
    cluster = np.asarray(so.cluster_index)
    ours = oracle.matching_weight(cluster, ei, w)

    assert ours >= mean_w - 1e-9, (
        f"device matching weight {ours:.4f} < reference expected {mean_w:.4f}"
    )


@pytest.mark.parametrize("seed", range(8))
def test_native_matching_weight_beats_reference_mean(seed):
    from tgp_tpu._native import native_graclus_matching

    g, s, r, w = _weighted_graph(seed)
    n = g[0].shape[0]
    ei = np.stack([s, r])
    mean_w, _ = _oracle_mean_weight(ei, n, w)

    try:
        cluster = native_graclus_matching(ei, n, w, seed=0)
    except OSError:
        pytest.skip("native library unavailable")
    ours = oracle.matching_weight(np.asarray(cluster), ei, w)
    assert ours >= mean_w - 1e-9, (
        f"native matching weight {ours:.4f} < reference expected {mean_w:.4f}"
    )


def test_oracle_matching_is_valid_matching():
    """The transcription itself produces a valid maximal matching."""
    g, s, r, w = _weighted_graph(3)
    n = g[0].shape[0]
    ei = np.stack([s, r])
    cluster = oracle.graclus_matching_randomized(ei, n, w, rng=7)
    _, counts = np.unique(cluster, return_counts=True)
    assert counts.max() <= 2  # pairs only
    # maximality: no edge joins two singleton clusters
    sizes = {c: k for c, k in zip(*np.unique(cluster, return_counts=True))}
    for a, b in zip(s, r):
        if a != b:
            assert not (sizes[cluster[a]] == 1 and sizes[cluster[b]] == 1)
