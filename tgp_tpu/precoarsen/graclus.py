"""Graclus level function — greedy heavy-edge matching (host side).

Reference: ``GraclusSelect`` → ``torch_cluster.graclus_cluster`` (C++/CUDA,
tgp/select/graclus_select.py:13-84).  The classic kernel scans vertices in
random order and matches each with its heaviest unmatched neighbor.  The
C++ implementation lives in :mod:`tgp_tpu._native` (same algorithm); this
module provides the NumPy fallback and the level-artifact wrapper.
"""

from __future__ import annotations

import numpy as np

from tgp_tpu.precoarsen.common import coalesce_numpy

__all__ = ["graclus_matching_numpy", "graclus_level"]


def graclus_matching_numpy(edge_index, num_nodes, edge_weight=None,
                           seed: int = 0) -> np.ndarray:
    """Deterministic weight-sorted greedy matching — the NumPy twin of the
    C++ ``graclus_matching`` (tgp_tpu/_native/native.cpp).  The reference's
    matcher scans vertices in random order (torch_cluster); processing edges
    heaviest-first instead dominates its expected matched weight (bound:
    tests/test_ref_parity_graclus.py).  ``seed`` is kept for API
    compatibility and ignored.  Returns ``cluster [n]`` with consecutive
    ids: matched pairs first (in match order), then singletons."""
    del seed
    ei = np.asarray(edge_index, np.int64)
    s, r = ei[0], ei[1]
    w = (np.ones(s.size) if edge_weight is None
         else np.asarray(edge_weight, np.float64))
    lo, hi = np.minimum(s, r), np.maximum(s, r)
    order = np.lexsort((hi, lo, -w))  # heaviest first, then (min,max) pair
    cluster = np.full(num_nodes, -1, np.int64)
    next_id = 0
    for i in order:
        u, v = s[i], r[i]
        if u == v or cluster[u] >= 0 or cluster[v] >= 0:
            continue
        cluster[u] = cluster[v] = next_id
        next_id += 1
    unmatched = cluster < 0
    cluster[unmatched] = next_id + np.arange(int(unmatched.sum()))
    return cluster


def graclus_level(edge_index, num_nodes, edge_weight=None, *,
                  seed: int = 0) -> dict:
    try:
        from tgp_tpu._native import native_graclus_matching

        cluster = native_graclus_matching(edge_index, num_nodes, edge_weight,
                                          seed)
    except Exception:
        cluster = graclus_matching_numpy(edge_index, num_nodes, edge_weight,
                                         seed)
    k = int(cluster.max()) + 1 if num_nodes else 0
    ei = np.asarray(edge_index)
    w = (np.ones(ei.shape[1], np.float32) if edge_weight is None
         else np.asarray(edge_weight, np.float32))
    pooled = np.stack([cluster[ei[0]], cluster[ei[1]]])
    keep = pooled[0] != pooled[1]
    ei_pool, ew_pool = coalesce_numpy(pooled[:, keep], w[keep], max(k, 1))
    return {
        "kind": "sparse",
        "cluster_index": cluster,
        "weight": np.ones(num_nodes, np.float32),
        "num_clusters": k,
        "edge_index": ei_pool,
        "edge_weight": ew_pool.astype(np.float32),
        "partial": False,
    }
