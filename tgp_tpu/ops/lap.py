"""Laplacian-derived propagation matrices (device-side, static shapes).

* :func:`delta_gcn_matrix` — ``P = I − δ·L_sym`` heterophilic propagation for
  MaxCutPool (reference: tgp/utils/ops.py:1061-1149; Abate & Bianchi 2025).
* :func:`laplacian` — (weighted, optionally sym-normalized) graph Laplacian
  as masked COO with an ``E+N`` static edge budget.
* :func:`lobpcg_max_eigvec` — dominant-eigenvector solver (power iteration on
  a shifted operator) used by NDP's spectral partitioning (reference uses
  ``torch.lobpcg``, tgp/select/ndp_select.py:186-259).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from tgp_tpu.ops.sparse import spmm, weighted_degree

__all__ = ["delta_gcn_matrix", "laplacian", "power_iteration_max_eigvec",
           "lobpcg"]


def laplacian(senders, receivers, edge_weight, edge_mask, node_mask,
              num_nodes: int, normalization: Optional[str] = None):
    """L = D − A (or sym-normalized ``I − D^{-1/2} A D^{-1/2}``) as masked COO
    with budget ``E+N`` (off-diagonal entries are ``−A``; diagonal appended)."""
    w = jnp.where(edge_mask, edge_weight, 0.0)
    deg = weighted_degree(senders, w, num_nodes)
    if normalization == "sym":
        dinv = jnp.where(deg > 0, jax.lax.rsqrt(jnp.maximum(deg, 1e-12)), 0.0)
        off_w = -w * dinv[senders] * dinv[receivers]
        diag_w = jnp.where(node_mask & (deg > 0), 1.0, 0.0)
    else:
        off_w = -w
        diag_w = jnp.where(node_mask, deg, 0.0)
    loops = jnp.arange(num_nodes, dtype=senders.dtype)
    s = jnp.concatenate([senders, loops])
    r = jnp.concatenate([receivers, loops])
    lw = jnp.concatenate([off_w, diag_w])
    m = jnp.concatenate([edge_mask, node_mask])
    return s, r, lw, m


def delta_gcn_matrix(senders, receivers, edge_weight, edge_mask, node_mask,
                     num_nodes: int, delta: float = 2.0):
    """``P = I − δ·L_sym = (1−δ)·I + δ·D^{-1/2} A D^{-1/2}`` (masked COO,
    budget ``E+N``)."""
    w = jnp.where(edge_mask, edge_weight, 0.0)
    deg = weighted_degree(senders, w, num_nodes)
    dinv = jnp.where(deg > 0, jax.lax.rsqrt(jnp.maximum(deg, 1e-12)), 0.0)
    off_w = delta * w * dinv[senders] * dinv[receivers]
    # isolated nodes have L_sym diagonal 0 → P diagonal 1
    diag_w = jnp.where(node_mask & (deg > 0), 1.0 - delta, 0.0) + jnp.where(
        node_mask & (deg <= 0), 1.0, 0.0)
    loops = jnp.arange(num_nodes, dtype=senders.dtype)
    s = jnp.concatenate([senders, loops])
    r = jnp.concatenate([receivers, loops])
    pw = jnp.concatenate([off_w, diag_w])
    m = jnp.concatenate([edge_mask, node_mask])
    return s, r, pw, m


def power_iteration_max_eigvec(senders, receivers, edge_weight, num_nodes: int,
                               num_iters: int = 100, seed: int = 0
                               ) -> jax.Array:
    """Dominant eigenvector of a (symmetric) masked-COO operator via power
    iteration — the device-side stand-in for ``torch.lobpcg(k=1)``."""
    key = jax.random.key(seed)
    v = jax.random.normal(key, (num_nodes, 1))

    def body(_, v):
        v = spmm(senders, receivers, edge_weight, v, num_nodes)
        return v / jnp.maximum(jnp.linalg.norm(v), 1e-12)

    v = jax.lax.fori_loop(0, num_iters, body, v)
    return v[:, 0]


def lobpcg(senders, receivers, edge_weight, num_nodes: int, k: int = 1,
           *, num_iters: int = 60, largest: bool = True, seed: int = 0,
           tol: float = 0.0):
    """Blocked LOBPCG for the ``k`` extreme eigenpairs of a symmetric
    masked-COO operator (reference uses ``torch.lobpcg``,
    tgp/select/ndp_select.py:186-259; this is the device-side equivalent).

    Fully jit-compatible: a fixed ``num_iters`` ``lax.fori_loop`` whose body
    is one SpMM block product ``A·[X|W|P]`` plus a ``3k×3k`` Rayleigh-Ritz
    (eigh on the MXU-friendly small matrix).  Returns ``(eigvals [k],
    eigvecs [N, k])`` sorted extreme-first.

    Orthonormalization uses a Cholesky-free symmetric QR via eigh of the
    Gram matrix (stable for the modest block sizes used here).
    """
    N, K = num_nodes, k

    def matvec(X):
        return spmm(senders, receivers, edge_weight, X, N)

    sgn = 1.0 if largest else -1.0

    def orthonormalize(V):
        """Symmetric-QR orthonormalization.  Returns ``(Q, valid)`` where
        column ``j`` of Q is EXACTLY zero when the Gram direction was
        near-null (no ``@ U.T`` back-rotation — keeping null directions
        pinned to identifiable columns lets the Ritz step exclude them;
        mixing them back would hand ``largest=False`` spurious 0
        eigenvalues that outrank ``−λ`` of a PSD operator)."""
        G = V.T @ V
        w, U = jnp.linalg.eigh(G)
        # relative rank cut: f32 Gram entries carry ~1e-7 noise, so
        # directions below ~1e-6 of the dominant one are numerically void
        valid = w > jnp.maximum(1e-8, 1e-6 * w[-1])
        scale = jnp.where(valid, jax.lax.rsqrt(jnp.clip(w, 1e-12, None)), 0.0)
        Q = V @ (U * scale[None, :])
        # near-threshold Gram eigenvalues are f32 noise: the "normalized"
        # column can come out with norm ≪ 1, then poisons every later Ritz
        # step.  Validate on the ACTUAL norm and renormalize or zero.
        nrm = jnp.linalg.norm(Q, axis=0)
        valid = valid & (nrm > 0.5)
        Q = Q * jnp.where(valid, 1.0 / jnp.maximum(nrm, 1e-12), 0.0)[None, :]
        return Q, valid

    key = jax.random.key(seed)
    X, _ = orthonormalize(jax.random.normal(key, (N, K)))
    P = jnp.zeros((N, K))

    def body(state):
        i, X, P, theta, _res = state
        AX = matvec(X)
        theta = jnp.sum(X * AX, axis=0)  # Rayleigh quotients
        R = AX - X * theta[None, :]
        res = jnp.max(jnp.linalg.norm(R, axis=0))
        # explicit deflation (R, P ⊥ X) keeps the Gram near-block-diagonal —
        # without it, converged residual noise re-enters the Ritz basis and
        # periodically knocks a converged eigenvector back out
        R = R - X @ (X.T @ R)
        P_d = P - X @ (X.T @ P)
        # subspace S = [X, R, P] (2K cols on iter 0 — P is zero, harmless)
        S, valid = orthonormalize(jnp.concatenate([X, R, P_d], axis=1))
        AS = matvec(S)
        H = S.T @ AS
        H = 0.5 * (H + H.T)
        # bury null columns at −∞ so the top-K Ritz picks never select them
        Hs = sgn * H + jnp.diag(jnp.where(valid, 0.0, -1e30))
        evals, evecs = jnp.linalg.eigh(Hs)
        # eigh ascends → take the LAST K columns for the extreme pairs
        C = evecs[:, -K:]
        X_new = S @ C
        # conjugate direction: the component of X_new outside span(X)
        P_new = X_new - X @ (X.T @ X_new)
        return i + 1, X_new, P_new, sgn * evals[-K:], res

    def cond(state):
        i, _, _, _, res = state
        not_done = i < num_iters
        if tol > 0.0:
            not_done = not_done & (res > tol)
        return not_done

    _, X, P, theta, _ = jax.lax.while_loop(
        cond, body, (0, X, P, jnp.zeros(K), jnp.asarray(jnp.inf)))
    # final Rayleigh quotients with consistent ordering (extreme first)
    order = jnp.argsort(-sgn * theta)
    return theta[order], X[:, order]
