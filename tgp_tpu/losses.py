"""Auxiliary pooling loss library — batched-dense and sparse/unbatched twins.

TPU re-design of the reference's 22-function loss library
(``tgp/utils/losses.py``, 1670 LoC).  Every loss exists in a **batched**
variant (dense ``S [B,N,K]`` / ``adj [B,N,N]`` on the MXU) and, where the
reference has one, a **sparse/unbatched twin** operating on the packed flat
layout (``S [N,K]`` + ``node_graph`` + masked COO edges) that produces the
*same scalar* — the reference's key internal oracle
(tests/poolers/test_dense_poolers_batched_vs_unbatched.py).

Design deltas vs the reference:
  * per-graph Python loops (unbatched ortho/cluster/jb/spectral/asym twins)
    become segment reductions — no host control flow under ``jit``;
  * dynamic ``adj.nonzero()`` edge extraction (``totvar_loss``) becomes a
    dense masked contraction — zero entries contribute zero;
  * all functions are padding-safe given the package conventions (padded S
    rows are zero, padded edge weights are zero).

Reference citations are per-function below.
"""

from __future__ import annotations

import math


import jax
import jax.numpy as jnp

from tgp_tpu import eps
from tgp_tpu.ops.segment import segment_sum
from tgp_tpu.ops.sparse import check_and_filter_edge_weights, rank3_trace, spmm

__all__ = [
    "mincut_loss",
    "sparse_mincut_loss",
    "sparse_ho_mincut_loss",
    "mincut_from_sums",
    "ho_mincut_from_motif",
    "link_pred_from_sums",
    "spectral_from_sums",
    "totvar_from_sums",
    "orthogonality_loss",
    "unbatched_orthogonality_loss",
    "hosc_orthogonality_loss",
    "unbatched_hosc_orthogonality_loss",
    "link_pred_loss",
    "sparse_link_pred_loss",
    "entropy_loss",
    "unbatched_entropy_loss",
    "totvar_loss",
    "sparse_totvar_loss",
    "asym_norm_loss",
    "unbatched_asym_norm_loss",
    "just_balance_loss",
    "unbatched_just_balance_loss",
    "spectral_loss",
    "sparse_spectral_loss",
    "cluster_loss",
    "unbatched_cluster_loss",
    "weighted_bce_reconstruction_loss",
    "sparse_bce_reconstruction_loss",
    "kl_loss",
    "beta_kl_divergence",
    "cluster_connectivity_prior_loss",
    "maxcut_loss",
]


def _batch_reduce(loss, batch_reduction: str = "mean"):
    if batch_reduction == "mean":
        return jnp.mean(loss)
    if batch_reduction == "sum":
        return jnp.sum(loss)
    raise ValueError(f"batch_reduction must be 'mean' or 'sum', got {batch_reduction}")


def _nodes_per_graph(node_graph, num_graphs, node_mask):
    ones = jnp.ones(node_graph.shape[0], jnp.float32)
    return segment_sum(ones, node_graph, num_graphs, mask=node_mask)


# ---------------------------------------------------------------------------
# Shared "from-sums" combinators.
#
# Every edge-dependent loss in this library decomposes into a handful of
# global sums (trace of SᵀAS, residual sums over edges, degree-weighted
# row norms, …) followed by a small scalar combine.  The combine step is
# factored out here so it exists ONCE and is shared by (a) the sparse
# twins below and (b) the node-sharded distributed path
# (tgp_tpu/parallel/dense_pool.py), which produces the same sums via
# psum/all_gather over a device mesh instead of segment ops.  The sharded
# loss-dict parity tests pin both callers to the same scalars.
# ---------------------------------------------------------------------------


def mincut_from_sums(num, den):
    """Combine mincut numerator/denominator sums: ``−num / (den + eps)``.
    ``num`` = per-graph Tr(SᵀAS) = Σ_e w_e⟨S_i,S_j⟩, ``den`` = per-graph
    Σ_n d_n‖S_n‖² (reference: losses.py:126-215)."""
    return -(num / (den + eps))


def ho_mincut_from_motif(S, motif_s, motif_deg, node_graph, num_graphs,
                         node_mask=None, batch_reduction="mean"):
    """Higher-order mincut from the already-applied motif operator:
    ``motif_s = A³·S`` and ``motif_deg = A³·1`` (reference:
    losses.py:218-316).  Shared by the sparse twin (three SpMMs) and the
    sharded path (three edge-partitioned SpMMs + all_gathers)."""
    num = segment_sum(jnp.sum(S * motif_s, axis=-1), node_graph, num_graphs,
                      mask=node_mask)
    den = segment_sum(motif_deg * jnp.sum(S * S, axis=-1), node_graph,
                      num_graphs, mask=node_mask)
    return _batch_reduce(mincut_from_sums(num, den), batch_reduction)


def link_pred_from_sums(sum_res, sum_ss, sts_fro_sq, nn_sum,
                        normalize_loss=True):
    """Combine the Frobenius-identity sums of ‖A−SSᵀ‖_F:
    ``sqrt(Σ_e(w_e−ss_e)² + Σ_g‖S_gᵀS_g‖²_F − Σ_e ss_e²)``, normalized by
    ``Σ_g n_g²`` (reference: losses.py:711-777)."""
    sq = jnp.clip(sum_res + sts_fro_sq - sum_ss, 0.0, None)
    loss = jnp.sqrt(sq)
    if normalize_loss:
        loss = loss / jnp.maximum(nn_sum, 1.0)
    return loss


def spectral_from_sums(tr_ast, ca, m):
    """Combine per-graph modularity sums: ``−(Tr(SᵀAS) − ‖dᵀS‖²/2m) / 2m``
    with ``ca = dᵀS`` ([...,K]) and ``m`` = per-graph edge-weight volume / 2
    (reference: losses.py:1151-1213)."""
    safe_m = jnp.maximum(m, eps)
    normalizer_tr = jnp.sum(ca * ca, -1) / (2 * safe_m)
    return -(tr_ast - normalizer_tr) / (2 * safe_m)


def totvar_from_sums(weighted_l1, n_edges):
    """Combine total-variation sums: ``Σ_e w_e|S_i−S_j|₁ / (2·E_g)``
    (reference: losses.py:865-917)."""
    return weighted_l1 / (2 * jnp.maximum(n_edges, 1.0))


# ---------------------------------------------------------------------------
# MinCut (reference: losses.py:39-84 batched, :126-215 sparse)
# ---------------------------------------------------------------------------


def mincut_loss(adj, S, adj_pooled, batch_reduction="mean"):
    """−Tr(SᵀAS)/Tr(SᵀDS) per graph (MinCutPool, Bianchi et al. 2020)."""
    num = rank3_trace(adj_pooled)
    d_flat = adj.sum(-1)
    den = rank3_trace(
        jnp.einsum("bnk,bn,bnj->bkj", S, d_flat, S)
    )
    return _batch_reduce(-(num / (den + eps)), batch_reduction)


def sparse_mincut_loss(senders, receivers, edge_weight, S, node_graph, num_graphs,
                       node_mask=None, batch_reduction="mean"):
    """Sparse twin of :func:`mincut_loss`: edge-wise ``w·⟨S_i,S_j⟩`` numerator,
    degree-weighted ``‖S_i‖²`` denominator (reference: losses.py:126-215)."""
    edge_weight = check_and_filter_edge_weights(edge_weight)
    N = S.shape[0]
    degrees = segment_sum(edge_weight, senders, N)
    den_per_node = degrees * jnp.sum(S * S, axis=-1)
    den = segment_sum(den_per_node, node_graph, num_graphs, mask=node_mask)
    edge_contrib = edge_weight * jnp.sum(S[senders] * S[receivers], axis=-1)
    num = segment_sum(edge_contrib, node_graph[senders], num_graphs)
    return _batch_reduce(mincut_from_sums(num, den), batch_reduction)


def sparse_ho_mincut_loss(senders, receivers, edge_weight, S, node_graph, num_graphs,
                          node_mask=None, batch_reduction="mean"):
    """Higher-order mincut over the motif adjacency ``M = A³`` without
    materializing M: ``MS = A(A(AS))`` via three SpMMs
    (reference: losses.py:218-316; used by HOSC)."""
    N = S.shape[0]
    Z = spmm(receivers, senders, edge_weight, S, N)  # A S (row i sums over j: A_ij S_j)
    Z = spmm(receivers, senders, edge_weight, Z, N)
    Z = spmm(receivers, senders, edge_weight, Z, N)

    ones = jnp.ones((N, 1), S.dtype)
    d = spmm(receivers, senders, edge_weight, ones, N)
    d = spmm(receivers, senders, edge_weight, d, N)
    d = spmm(receivers, senders, edge_weight, d, N)[:, 0]
    return ho_mincut_from_motif(S, Z, d, node_graph, num_graphs,
                                node_mask=node_mask,
                                batch_reduction=batch_reduction)


# ---------------------------------------------------------------------------
# Orthogonality (reference: losses.py:87-123 batched, :319-389 unbatched)
# ---------------------------------------------------------------------------


def orthogonality_loss(S, batch_reduction="mean"):
    """‖SᵀS/‖SᵀS‖_F − I_K/√K‖_F (MinCutPool / DMoN)."""
    STS = jnp.einsum("bnk,bnj->bkj", S, S)
    nrm = jnp.linalg.norm(STS, axis=(-2, -1), keepdims=True)
    STS_term = STS / jnp.maximum(nrm, eps)
    k = S.shape[-1]
    id_k = jnp.eye(k, dtype=S.dtype) / math.sqrt(k)
    return _batch_reduce(
        jnp.linalg.norm(STS_term - id_k, axis=(-2, -1)), batch_reduction
    )


def _per_graph_sts(S, node_graph, num_graphs, node_mask=None):
    """``[B,K,K]`` per-graph SᵀS via per-node outer products + segment sum
    (replaces the reference's per-graph Python loop, losses.py:357-379)."""
    outer = S[:, :, None] * S[:, None, :]
    return segment_sum(outer, node_graph, num_graphs, mask=node_mask)


def unbatched_orthogonality_loss(S, node_graph, num_graphs, node_mask=None,
                                 batch_reduction="mean"):
    STS = _per_graph_sts(S, node_graph, num_graphs, node_mask)
    nrm = jnp.linalg.norm(STS, axis=(-2, -1), keepdims=True)
    STS_term = STS / jnp.maximum(nrm, eps)
    k = S.shape[-1]
    id_k = jnp.eye(k, dtype=S.dtype) / math.sqrt(k)
    return _batch_reduce(
        jnp.linalg.norm(STS_term - id_k, axis=(-2, -1)), batch_reduction
    )


# ---------------------------------------------------------------------------
# HOSC orthogonality (reference: losses.py:597-641 batched, :392-432 unbatched)
# ---------------------------------------------------------------------------


def hosc_orthogonality_loss(S, mask=None, batch_reduction="mean"):
    B, num_nodes, K = S.shape
    if K <= 1:
        return _batch_reduce(jnp.zeros(B, S.dtype), batch_reduction)
    norm = jnp.sqrt(jnp.sum(S * S, axis=-2) + 0.0).sum(-1)
    sqrt_k = math.sqrt(K)
    if mask is not None:
        n_g = mask.sum(1).astype(S.dtype)
        loss = (sqrt_k - norm / jnp.sqrt(jnp.maximum(n_g, 1.0))) / (sqrt_k - 1)
        # an all-masked (empty padded) graph must contribute 0, not the
        # maximal constant sqrt_k/(sqrt_k−1) (ADVICE r4) — mirror the twin
        loss = jnp.where(n_g > 0, loss, 0.0)
    else:
        loss = (sqrt_k - norm / math.sqrt(num_nodes)) / (sqrt_k - 1)
    return _batch_reduce(loss, batch_reduction)


def unbatched_hosc_orthogonality_loss(S, node_graph, num_graphs, node_mask=None,
                                      batch_reduction="mean"):
    K = S.shape[-1]
    if K <= 1:
        return jnp.zeros((), S.dtype)
    col_sq = segment_sum(S * S, node_graph, num_graphs, mask=node_mask)  # [B,K]
    norm = jnp.sqrt(col_sq).sum(-1)
    n_g = _nodes_per_graph(node_graph, num_graphs, node_mask)
    sqrt_k = math.sqrt(K)
    loss = (sqrt_k - norm / jnp.sqrt(jnp.maximum(n_g, 1.0))) / (sqrt_k - 1)
    loss = jnp.where(n_g > 0, loss, 0.0)  # empty graph slots contribute 0
    return _batch_reduce(loss, batch_reduction)


# ---------------------------------------------------------------------------
# DiffPool link prediction + entropy
# (reference: losses.py:644-679, :682-708, :711-777, :476-500)
# ---------------------------------------------------------------------------


def link_pred_loss(S, adj, normalize_loss=True, mask=None):
    """Global Frobenius norm ‖A − SSᵀ‖_F over the whole batch, optionally
    normalized by the number of adjacency entries.

    With a ``mask`` the normalizer is the number of VALID entries
    ``Σ_g n_g²`` — same as :func:`sparse_link_pred_loss` — so the twins
    return the same scalar on padded batches.  (The reference divides its
    dense loss by ``adj.numel()`` including padding, tgp/utils/losses.py:
    676-679, while its own sparse twin uses ``Σ n_g²``, :771-777 — an
    inconsistency its tests never hit because they use equal-size graphs;
    the mask-native normalizer is also padding-invariant, which the padded
    TPU layout requires.)"""
    ss = jnp.einsum("bnk,bmk->bnm", S, S)
    diff = adj - ss
    if mask is not None:
        m = mask.astype(S.dtype)
        diff = diff * m[:, :, None] * m[:, None, :]
    loss = jnp.sqrt(jnp.sum(diff * diff) + 0.0)
    if normalize_loss:
        if mask is not None:
            n_g = jnp.sum(mask.astype(S.dtype), axis=-1)
            loss = loss / jnp.maximum(jnp.sum(n_g * n_g), 1.0)
        else:
            loss = loss / adj.size
    return loss


def sparse_link_pred_loss(S, senders, receivers, edge_weight, node_graph, num_graphs,
                          node_mask=None, normalize_loss=True):
    """Sparse twin via ‖A−SSᵀ‖²_F = Σ_e (w_e−ss_e)² + Σ_g ‖S_gᵀS_g‖²_F − Σ_e ss_e²
    (reference: losses.py:711-777).  Note: to match the batched loss on padded
    batches, ``normalize_loss`` divides by ``Σ_g n_g²`` computed from the mask."""
    edge_weight = check_and_filter_edge_weights(edge_weight)
    ss_ij = jnp.sum(S[senders] * S[receivers], axis=-1)
    sum_res = jnp.sum((edge_weight - ss_ij) ** 2 * (edge_weight != 0))
    # correction: padded edges have w=0 AND ss may be nonzero only if both
    # endpoints carry nonzero S rows; padded rows are zero, so ss_e=0 there.
    sum_ss = jnp.sum(ss_ij**2 * (edge_weight != 0))
    STS = _per_graph_sts(S, node_graph, num_graphs, node_mask)
    n_g = _nodes_per_graph(node_graph, num_graphs, node_mask)
    return link_pred_from_sums(sum_res, sum_ss, jnp.sum(STS * STS),
                               jnp.sum(n_g * n_g),
                               normalize_loss=normalize_loss)


def unbatched_entropy_loss(S, num_nodes=None, node_mask=None):
    """Mean per-node assignment entropy (reference: losses.py:476-500)."""
    ent = -jnp.sum(S * jnp.log(S + eps), axis=-1)
    if node_mask is not None:
        ent = jnp.where(node_mask, ent, 0.0)
        denom = jnp.maximum(jnp.sum(node_mask), 1)
    else:
        denom = S.shape[0] if num_nodes is None else num_nodes
    return jnp.sum(ent) / denom


def entropy_loss(S, num_nodes=None, mask=None):
    """Batched entropy = flattened unbatched entropy (reference: losses.py:682-708)."""
    S2 = S.reshape(-1, S.shape[-1])
    m2 = mask.reshape(-1) if mask is not None else None
    return unbatched_entropy_loss(S2, num_nodes=num_nodes, node_mask=m2)


# ---------------------------------------------------------------------------
# Total variation + asymmetric norm (TVGNN / AsymCheegerCut)
# (reference: losses.py:780-862, :865-917, :920-1010, :503-550)
# ---------------------------------------------------------------------------


def totvar_loss(S, adj, batch_reduction="mean"):
    """Σ_ij a_ij |S_i − S_j|₁ / (2·E_g) per graph.  Dense masked contraction —
    zero adjacency entries contribute zero, so no dynamic edge extraction is
    needed (reference extracts nonzeros, losses.py:780-862).

    The ``[B,N,N,K]`` broadcast below is notation, not memory: XLA fuses the
    abs-diff into the reduction (measured on v5e at B=16, N=1024, K=16 —
    grad-path temp = 67 MB ≈ one [B,N,N] buffer, not the 1.07 GB 4-D
    tensor), so no K-loop restructuring is needed."""
    l1 = jnp.sum(jnp.abs(S[:, :, None, :] - S[:, None, :, :]), axis=-1)
    loss = jnp.sum(adj * l1, axis=(-2, -1))
    n_edges = jnp.sum(adj != 0, axis=(-2, -1)).astype(S.dtype)
    return _batch_reduce(loss / (2 * jnp.maximum(n_edges, 1.0)), batch_reduction)


def sparse_totvar_loss(senders, receivers, edge_weight, S, node_graph, num_graphs,
                       batch_reduction="mean"):
    edge_weight = check_and_filter_edge_weights(edge_weight)
    l1 = jnp.sum(jnp.abs(S[senders] - S[receivers]), axis=-1)
    w = edge_weight * l1
    eg = node_graph[senders]
    loss = segment_sum(w, eg, num_graphs)
    n_edges = segment_sum((edge_weight != 0).astype(S.dtype), eg, num_graphs)
    return _batch_reduce(totvar_from_sums(loss, n_edges), batch_reduction)


def _masked_col_quantile(S, k, node_graph, num_graphs, node_mask):
    """Per-(graph, column) value of rank ``floor(n_g/k)`` by descending order —
    the ρ-quantile of the asym-norm loss, computed with one lexsort over the
    flattened (graph·column) segments."""
    from tgp_tpu.ops.segment import segment_topk_rank

    N, K = S.shape
    cols = jnp.tile(jnp.arange(K, dtype=jnp.int32), (N, 1))
    seg = node_graph[:, None] * K + cols  # [N,K]
    flat_vals = S.reshape(-1)
    flat_seg = seg.reshape(-1)
    flat_mask = (
        jnp.repeat(node_mask, K) if node_mask is not None else None
    )
    rank = segment_topk_rank(flat_vals, flat_seg, num_graphs * K, mask=flat_mask)
    n_g = _nodes_per_graph(node_graph, num_graphs, node_mask)
    idx = jnp.minimum(jnp.floor(n_g / k), jnp.maximum(n_g - 1, 0)).astype(jnp.int32)
    target = jnp.broadcast_to(idx[node_graph][:, None], (N, K)).reshape(-1)
    sel = (rank == target)
    if flat_mask is not None:
        sel = sel & flat_mask
    quant = segment_sum(jnp.where(sel, flat_vals, 0.0), flat_seg, num_graphs * K)
    return quant.reshape(num_graphs, K), n_g


def unbatched_asym_norm_loss(S, k, node_graph, num_graphs, node_mask=None,
                             batch_reduction="mean"):
    if k <= 1:
        return jnp.zeros((), S.dtype)
    quant, n_g = _masked_col_quantile(S, k, node_graph, num_graphs, node_mask)
    diff = S - quant[node_graph]
    asym = jnp.where(diff >= 0, (k - 1) * diff, -diff)
    if node_mask is not None:
        asym = jnp.where(node_mask[:, None], asym, 0.0)
    inner = segment_sum(asym.sum(-1), node_graph, num_graphs, mask=node_mask)
    beta = n_g * (k - 1)
    loss = (beta - inner) / jnp.maximum(beta, 1.0)
    return _batch_reduce(loss, batch_reduction)


def asym_norm_loss(S, k, mask=None, batch_reduction="mean"):
    """Batched ρ-quantile balance loss (reference: losses.py:920-1010).
    With a mask, matches the per-graph (unbatched) semantics."""
    B, N, K = S.shape
    if k <= 1:
        return jnp.zeros((), S.dtype)
    if mask is None:
        idx = min(int(math.floor(N / k)), N - 1)
        s_sorted = jnp.sort(S, axis=-2)[:, ::-1, :]
        quant = s_sorted[:, idx, :]  # [B, K]
        diff = S - quant[:, None, :]
        asym = jnp.where(diff >= 0, (k - 1) * diff, -diff)
        inner = asym.sum((-1, -2))
        beta = N * (k - 1)
        return _batch_reduce((beta - inner) / beta, batch_reduction)
    # masked: per-graph quantile index floor(n_g/k)
    n_g = mask.sum(-1).astype(S.dtype)
    S_m = jnp.where(mask[..., None], S, -jnp.inf)
    s_sorted = jnp.sort(S_m, axis=-2)[:, ::-1, :]
    idx = jnp.minimum(jnp.floor(n_g / k), jnp.maximum(n_g - 1, 0)).astype(jnp.int32)
    quant = jnp.take_along_axis(s_sorted, idx[:, None, None].repeat(K, -1), axis=-2)
    quant = quant[:, 0, :]
    diff = jnp.where(mask[..., None], S - quant[:, None, :], 0.0)
    asym = jnp.where(diff >= 0, (k - 1) * diff, -diff)
    asym = jnp.where(mask[..., None], asym, 0.0)
    inner = asym.sum((-1, -2))
    beta = n_g * (k - 1)
    return _batch_reduce((beta - inner) / jnp.maximum(beta, 1.0), batch_reduction)


# ---------------------------------------------------------------------------
# JustBalance (reference: losses.py:1013-1080 batched, :553-594 unbatched)
# ---------------------------------------------------------------------------


def just_balance_loss(S, mask=None, normalize_loss=True, batch_reduction="mean"):
    """−Tr(√(SᵀS)) with *elementwise* sqrt of the diagonal (matching the
    reference's elementwise ``sqrt(ss + eps)`` then trace)."""
    K = S.shape[-1]
    diag = jnp.sum(S * S, axis=-2)  # [B, K] == diag(SᵀS)
    loss = -jnp.sum(jnp.sqrt(diag + eps), axis=-1)
    if normalize_loss:
        if mask is None:
            denom = math.sqrt(S.shape[-2] * K)
        else:
            # maximum(·, 1) like the unbatched twin: an all-masked row
            # must not divide by zero (−inf through the batch mean)
            denom = jnp.sqrt(jnp.maximum(
                mask.sum(-1).astype(S.dtype) * K, 1.0))
        loss = loss / denom
    return _batch_reduce(loss, batch_reduction)


def unbatched_just_balance_loss(S, node_graph, num_graphs, node_mask=None,
                                normalize_loss=True, batch_reduction="mean"):
    K = S.shape[-1]
    diag = segment_sum(S * S, node_graph, num_graphs, mask=node_mask)  # [B,K]
    loss = -jnp.sum(jnp.sqrt(diag + eps), axis=-1)
    if normalize_loss:
        n_g = _nodes_per_graph(node_graph, num_graphs, node_mask)
        loss = loss / jnp.sqrt(jnp.maximum(n_g * K, 1.0))
    return _batch_reduce(loss, batch_reduction)


# ---------------------------------------------------------------------------
# DMoN spectral modularity + cluster size
# (reference: losses.py:1083-1148, :1151-1213, :1216-1265, :435-473)
# ---------------------------------------------------------------------------


def spectral_loss(adj, S, adj_pooled, mask=None, batch_reduction="mean"):
    B, N, K = S.shape
    if mask is None:
        mask = jnp.ones((B, N), bool)
    degrees = adj.sum(-1) * mask
    m = degrees.sum(-1) / 2
    safe_m = jnp.where(m > 0, m, 1.0)
    ca = jnp.einsum("bnk,bn->bk", S, degrees)
    normalizer_tr = jnp.sum(ca * ca, -1) / (2 * safe_m)
    loss = -(rank3_trace(adj_pooled) - normalizer_tr) / (2 * safe_m)
    loss = jnp.where(m > 0, loss, 0.0)
    return _batch_reduce(loss, batch_reduction)


def sparse_spectral_loss(senders, receivers, edge_weight, S, node_graph, num_graphs,
                         node_mask=None, batch_reduction="mean"):
    edge_weight = check_and_filter_edge_weights(edge_weight)
    N = S.shape[0]
    degrees = segment_sum(edge_weight, senders, N)
    eg = node_graph[senders]
    edge_contrib = edge_weight * jnp.sum(S[senders] * S[receivers], axis=-1)
    tr_ast = segment_sum(edge_contrib, eg, num_graphs)
    m = segment_sum(edge_weight, eg, num_graphs) / 2
    ca = segment_sum(S * degrees[:, None], node_graph, num_graphs, mask=node_mask)
    return _batch_reduce(spectral_from_sums(tr_ast, ca, m), batch_reduction)


def cluster_loss(S, mask=None, batch_reduction="mean"):
    B, N, K = S.shape
    if mask is None:
        mask = jnp.ones((B, N), bool)
    cluster_size = jnp.sum(S, axis=-2)  # [B,K]
    loss = (
        jnp.linalg.norm(cluster_size, axis=-1)
        / jnp.maximum(mask.sum(-1).astype(S.dtype), 1.0)
        * math.sqrt(K)
        - 1
    )
    return _batch_reduce(loss, batch_reduction)


def unbatched_cluster_loss(S, node_graph, num_graphs, node_mask=None,
                           batch_reduction="mean"):
    K = S.shape[-1]
    cluster_size = segment_sum(S, node_graph, num_graphs, mask=node_mask)  # [B,K]
    n_g = _nodes_per_graph(node_graph, num_graphs, node_mask)
    loss = (
        jnp.linalg.norm(cluster_size, axis=-1) / jnp.maximum(n_g, 1.0) * math.sqrt(K)
        - 1
    )
    return _batch_reduce(loss, batch_reduction)


# ---------------------------------------------------------------------------
# BNPool: weighted BCE reconstruction, Beta KL, K-prior
# (reference: losses.py:1268-1356, :1359-1443, :1446-1517, :1520-1562)
# ---------------------------------------------------------------------------


def _bce_with_logits(logits, targets):
    # log(1 + exp(-|x|)) + max(x, 0) - x*y
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def weighted_bce_reconstruction_loss(rec_adj, adj, mask=None, balance_links=True,
                                     normalizing_const=None,
                                     batch_reduction="mean"):
    """Class-balanced BCE between reconstructed logits ``SKSᵀ`` and the
    adjacency (reference: losses.py:1268-1356)."""
    loss = _bce_with_logits(rec_adj, adj)
    edge_mask = adj != 0
    if mask is not None:
        edge_mask = edge_mask & mask[:, :, None] & mask[:, None, :]
        N = mask.sum(-1)
    else:
        N = jnp.full(adj.shape[0], adj.shape[-1])
    if balance_links:
        n_edges = edge_mask.sum((-1, -2))
        n_not = jnp.clip(N * N - n_edges, 1, None)
        balance = (n_not / jnp.clip(n_edges, 1, None)).astype(loss.dtype)
        loss = jnp.where(edge_mask, loss * balance[:, None, None], loss)
    if mask is not None:
        m = mask.astype(loss.dtype)
        loss = loss * m[:, :, None] * m[:, None, :]
    loss = loss.sum((-1, -2))
    if normalizing_const is not None:
        loss = loss / normalizing_const
    return _batch_reduce(loss, batch_reduction)


def sparse_bce_reconstruction_loss(link_logits, true_y, edges_graph=None,
                                   num_graphs=None, sample_mask=None,
                                   batch_reduction="mean"):
    """Per-sampled-edge BCE with per-graph mean (reference: losses.py:1520-1562).
    Returns ``(loss, per_graph_count)``."""
    rec = _bce_with_logits(link_logits, true_y)
    if edges_graph is None:
        if sample_mask is not None:
            cnt = jnp.maximum(sample_mask.sum(), 1)
            return jnp.sum(jnp.where(sample_mask, rec, 0.0)) / cnt, cnt
        return jnp.mean(rec), jnp.asarray(rec.shape[0])
    summed = segment_sum(rec, edges_graph, num_graphs, mask=sample_mask)
    cnt = segment_sum(jnp.ones_like(rec), edges_graph, num_graphs, mask=sample_mask)
    cnt = jnp.clip(cnt, 1, None)
    return _batch_reduce(summed / cnt, batch_reduction), cnt


def beta_kl_divergence(a_q, b_q, a_p, b_p):
    """Analytic KL(Beta(a_q,b_q) ‖ Beta(a_p,b_p)) (replaces
    ``torch.distributions.kl_divergence``; used by BNPool's DPSelect)."""
    from jax.scipy.special import betaln, digamma

    return (
        betaln(a_p, b_p)
        - betaln(a_q, b_q)
        + (a_q - a_p) * digamma(a_q)
        + (b_q - b_p) * digamma(b_q)
        + (a_p - a_q + b_p - b_q) * digamma(a_q + b_q)
    )


def kl_loss(kl_per_node, mask=None, node_graph=None, num_graphs=None,
            node_mask=None, normalizing_const=None, batch_reduction="mean"):
    """Reduce a per-node KL (already summed over its last/event axis) to a
    scalar: masked-sum over nodes (batched ``[B,N]``) or segment-sum
    (flat ``[N]`` + ``node_graph``, with ``node_mask`` excluding padding
    rows — their posterior is NOT the prior, so an unmasked sum would add
    phantom KL to the graph holding the padding); reference:
    losses.py:1359-1443."""
    if mask is not None and node_graph is not None:
        raise ValueError("Cannot specify both mask and node_graph")
    if node_graph is not None:
        loss = segment_sum(kl_per_node, node_graph, num_graphs,
                           mask=node_mask)
    elif mask is not None:
        loss = jnp.sum(jnp.where(mask, kl_per_node, 0.0), axis=-1)
    else:
        loss = jnp.sum(kl_per_node, axis=-1)
    if normalizing_const is not None:
        loss = loss / normalizing_const
    return _batch_reduce(loss, batch_reduction)


def cluster_connectivity_prior_loss(K, K_mu, K_var, normalizing_const=None,
                                    batch_reduction="mean"):
    prior = jnp.sum(0.5 * (K - K_mu) ** 2 / K_var)
    if normalizing_const is not None:
        bs = normalizing_const.shape[0] if normalizing_const.ndim > 0 else 1
        prior = prior / bs / normalizing_const
    return _batch_reduce(prior, batch_reduction)


# ---------------------------------------------------------------------------
# MaxCut (reference: losses.py:1565-1670; already sparse)
# ---------------------------------------------------------------------------


def maxcut_loss(scores, senders, receivers, edge_weight, node_graph, num_graphs,
                batch_reduction="mean"):
    """−zᵀAz / vol(G) per graph for a score vector z ∈ [−1, 1]."""
    edge_weight = check_and_filter_edge_weights(edge_weight)
    if scores.ndim == 2:
        scores = scores[:, 0]
    N = scores.shape[0]
    az = spmm(receivers, senders, edge_weight, scores[:, None], N)[:, 0]
    cut = segment_sum(scores * az, node_graph, num_graphs)
    vol = segment_sum(edge_weight, node_graph[senders], num_graphs)
    vol = jnp.where(vol == 0, 1.0, vol)
    return _batch_reduce(cut / vol, batch_reduction)
