"""Graclus level function — greedy heavy-edge matching (host side).

Reference: ``GraclusSelect`` → ``torch_cluster.graclus_cluster`` (C++/CUDA,
tgp/select/graclus_select.py:13-84).  The classic kernel scans vertices in
random order and matches each with its heaviest unmatched neighbor.  The
C++ implementation lives in :mod:`tgp_tpu._native` (same algorithm); this
module provides the NumPy fallback and the level-artifact wrapper.
"""

from __future__ import annotations

import numpy as np

from tgp_tpu.precoarsen.common import coalesce_numpy, to_csr

__all__ = ["graclus_matching_numpy", "graclus_level"]


def graclus_matching_numpy(edge_index, num_nodes, edge_weight=None,
                           seed: int = 0) -> np.ndarray:
    """Random-order vertex scan, heaviest-unmatched-neighbor matching.
    Returns ``cluster [n]`` with consecutive ids."""
    rng = np.random.default_rng(seed)
    A = to_csr(edge_index, num_nodes, edge_weight)
    A = A.maximum(A.T).tocsr()
    order = rng.permutation(num_nodes)
    cluster = np.full(num_nodes, -1, np.int64)
    next_id = 0
    indptr, indices, data = A.indptr, A.indices, A.data
    for u in order:
        if cluster[u] >= 0:
            continue
        best, best_w = -1, -np.inf
        for idx in range(indptr[u], indptr[u + 1]):
            v = indices[idx]
            if v != u and cluster[v] < 0 and data[idx] > best_w:
                best, best_w = v, data[idx]
        cluster[u] = next_id
        if best >= 0:
            cluster[best] = next_id
        next_id += 1
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
