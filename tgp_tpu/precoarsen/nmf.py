"""NMF pooling level function (reference: ``NMFSelect``,
tgp/select/nmf_select.py:14-226; Bacciu & Di Sotto 2019).

``A ≈ WH`` via sklearn ``non_negative_factorization``; soft assignment
``S = softmax(Hᵀ)`` padded to a fixed ``k`` for collation; pooled
connectivity ``A' = SᵀAS`` sparsified (the reference's ``preconnector`` with
``sparse_output=True``, tgp/poolers/nmf.py:134-140).
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from tgp_tpu.precoarsen.common import csr_to_edge_index, to_csr

__all__ = ["nmf_level"]


def nmf_level(edge_index, num_nodes, edge_weight=None, *, k: int = 8,
              seed: int = 0, prune_eps: float = 1e-6,
              degree_norm: bool = True) -> dict:
    from sklearn.decomposition import non_negative_factorization

    A = to_csr(edge_index, num_nodes, edge_weight)
    Ad = np.clip(A.toarray(), 0.0, None)  # NMF needs non-negative input
    k_eff = max(1, min(k, num_nodes))
    # reference edge cases (nmf_select.py:_factorize_single_adjacency):
    # k ≥ n (n > 1) → identity assignment; k == 1 → all-ones column;
    # otherwise softmax(Hᵀ) of a random-init factorization
    if num_nodes > 1 and k_eff >= num_nodes:
        S = np.eye(num_nodes)
    elif k_eff == 1:
        S = np.ones((num_nodes, 1))
    else:
        W, H, _ = non_negative_factorization(
            Ad, n_components=k_eff, init="random", random_state=seed,
            max_iter=5000)
        logits = H.T - H.T.max(1, keepdims=True)
        S = np.exp(logits)
        S = S / np.clip(S.sum(1, keepdims=True), 1e-12, None)
    if S.shape[1] < k:  # fixed_k padding for collation (reference pad)
        S = np.concatenate([S, np.zeros((num_nodes, k - S.shape[1]))], axis=1)

    A_pool = S.T @ A.toarray() @ S
    np.fill_diagonal(A_pool, 0.0)
    if degree_norm:
        # reference default: DenseConnect(degree_norm=True, nmf.py:97)
        d = np.sqrt(np.clip(A_pool.sum(1), 1e-8, None))
        A_pool = A_pool / d[:, None] / d[None, :]
    A_pool[np.abs(A_pool) < prune_eps] = 0.0
    ei_pool, ew_pool = csr_to_edge_index(sp.csr_matrix(A_pool))
    return {
        "kind": "dense",
        "s": S.astype(np.float32),
        "num_clusters": k,
        "edge_index": ei_pool,
        "edge_weight": ew_pool,
        "partial": False,
    }
