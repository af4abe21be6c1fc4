"""EigenPool level function (reference: ``eigenpool_select`` driver,
tgp/select/eigenpool_select.py:82-467; Ma et al., KDD 2019).

Spectral clustering → hard partition Ω; pooling operator Θ ∈ [N, H·K]
stacking the first ``H`` eigenvectors of each cluster's subgraph Laplacian
(sign-fixed reference-exactly: flipped iff the FIRST entry is negative —
eigenpool_select.py:146-149; a zero first entry keeps LAPACK's sign, same
as the reference; columns indexed mode-major
``h·K + c``); pooled connectivity ``A' = Ωᵀ(A − A_int)Ω`` where ``A_int``
keeps only intra-cluster edges (reference: EigenPoolConnect,
tgp/connect/eigenpool_conn.py:19-321).
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from tgp_tpu.precoarsen.common import csr_to_edge_index, to_csr

__all__ = ["eigenpool_level"]


def _subgraph_eigvecs(A_sub: np.ndarray, H: int,
                      normalized: bool = True) -> np.ndarray:
    """First ``H`` eigenvectors of the cluster's Laplacian (normalized by
    default), reference-exact (eigenpool_select.py:17-68 + :129-153): modes
    beyond ``n−1`` repeat the last eigenvector; sign flipped iff the first
    entry is negative."""
    n = A_sub.shape[0]
    if normalized:
        d = (A_sub.sum(0).reshape(-1)
             + np.spacing(np.array(0, dtype=A_sub.dtype)))
        dis = 1.0 / np.sqrt(d)
        L = np.eye(n, dtype=A_sub.dtype) - (dis[:, None] * A_sub
                                            * dis[None, :])
    else:
        L = np.diag(A_sub.sum(0).reshape(-1)) - A_sub
    w, v = np.linalg.eigh(L)
    out = np.zeros((n, H))
    for j in range(H):
        col = v[:, min(j, n - 1)]
        if col[0] < 0:
            col = -col
        out[:, j] = col
    return out


def eigenpool_level(edge_index, num_nodes, edge_weight=None, *, k: int = 8,
                    num_modes: int = 3, seed: int = 0,
                    degree_norm: bool = True,
                    normalized: bool = True) -> dict:
    from sklearn.cluster import SpectralClustering

    A = to_csr(edge_index, num_nodes, edge_weight)
    A = A.maximum(A.T)
    Ad = A.toarray()
    k_eff = min(k, num_nodes)
    if k_eff <= 1 or num_nodes <= 2:
        labels = np.zeros(num_nodes, np.int64)
        k_eff = 1
    else:
        scl = SpectralClustering(
            n_clusters=k_eff, affinity="precomputed", random_state=seed,
            assign_labels="discretize")
        labels = scl.fit_predict(Ad + 1e-12)

    H = num_modes
    K = k  # fixed_k collation width (reference eigenpool.py:253-273)
    theta = np.zeros((num_nodes, H * K), np.float32)
    for c in range(k_eff):
        nodes = np.nonzero(labels == c)[0]
        if nodes.size == 0:
            continue
        if nodes.size == 1:
            # reference quirk (eigenpool_select.py:136-139): a singleton
            # cluster writes its self-loop weight (0 for simple graphs)
            # into every mode column
            theta[nodes[0], c::K] = float(Ad[nodes[0], nodes[0]])
            continue
        vecs = _subgraph_eigvecs(Ad[np.ix_(nodes, nodes)], H,
                                 normalized=normalized)
        for h in range(H):
            theta[nodes, h * K + c] = vecs[:, h]

    # pooled adjacency: Ωᵀ (A − A_int) Ω
    omega = np.zeros((num_nodes, K), np.float32)
    omega[np.arange(num_nodes), labels] = 1.0
    inter = Ad * (labels[:, None] != labels[None, :])
    A_pool = omega.T @ inter @ omega
    np.fill_diagonal(A_pool, 0.0)
    if degree_norm:
        # reference default: EigenPoolConnect(degree_norm=True,
        # eigenpool_conn.py:77) → postprocess_adj_pool_sparse sym norm with
        # sender-side degrees clamped at eps
        d = np.sqrt(np.clip(A_pool.sum(1), 1e-8, None))
        A_pool = A_pool / d[:, None] / d[None, :]
    ei_pool, ew_pool = csr_to_edge_index(sp.csr_matrix(A_pool))
    return {
        "kind": "eigen",
        "cluster_index": labels.astype(np.int64),
        "theta": theta,
        "num_modes": H,
        "num_clusters": K,
        "edge_index": ei_pool,
        "edge_weight": ew_pool,
        "partial": False,
    }
