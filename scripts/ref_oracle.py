"""Reference-math oracle (NumPy, float64).

An *independent* re-implementation of the reference library's forward math,
transcribed formula-by-formula from the reference sources (citations per
function).  ``tests/test_ref_parity.py`` feeds both this oracle and the JAX
package the SAME weights and graphs and asserts the outputs agree — this is
the reference-independent correctness check (the reference stack itself
cannot run in this image: no torch_geometric).

Everything here is deliberately the *naive dense math* (per-graph loops,
dense matmuls, O(N^2) contractions): clarity over speed, so that the oracle
stays an oracle.  No code is shared with tgp_tpu.
"""

from __future__ import annotations

import math

import numpy as np

EPS = 1e-8  # reference: tgp/__init__.py:6

ACTS = {
    None: lambda v: np.maximum(v, 0.0),
    "relu": lambda v: np.maximum(v, 0.0),
    "tanh": np.tanh,
    "sigmoid": lambda v: 1.0 / (1.0 + np.exp(-v)),
    "elu": lambda v: np.where(v > 0, v, np.expm1(v)),
}


# ---------------------------------------------------------------------------
# Batch assembly (reference: torch_geometric to_dense_batch / to_dense_adj,
# used by tgp/src.py:414-452 preprocessing)
# ---------------------------------------------------------------------------


def dense_batch(graphs, n_max=None):
    """graphs: list of (x [n,F], edge_index [2,e], edge_weight [e]) numpy.

    Returns x [B,Nmax,F], adj [B,Nmax,Nmax], mask [B,Nmax] in float64.
    """
    sizes = [g[0].shape[0] for g in graphs]
    if n_max is None:
        n_max = max(sizes)
    B, F = len(graphs), graphs[0][0].shape[1]
    x = np.zeros((B, n_max, F))
    adj = np.zeros((B, n_max, n_max))
    mask = np.zeros((B, n_max), dtype=bool)
    for b, g in enumerate(graphs):
        xg, ei = np.asarray(g[0], np.float64), np.asarray(g[1])
        ew = np.asarray(g[2], np.float64) if len(g) > 2 else np.ones(ei.shape[1])
        n = xg.shape[0]
        x[b, :n] = xg
        mask[b, :n] = True
        np.add.at(adj[b], (ei[0], ei[1]), ew)
    return x, adj, mask


# ---------------------------------------------------------------------------
# Select / reduce / connect / postprocess
# ---------------------------------------------------------------------------


def mlp(x, layers, act=None):
    """PyG ``MLP(channel_list, norm=None)`` forward (reference:
    tgp/select/mlp_select.py:65): Linear → act between layers, last layer
    linear.  ``layers`` is a list of (W [in,out], b [out]) in flax layout."""
    a = ACTS[act]
    for W, b in layers[:-1]:
        x = a(x @ W + b)
    W, b = layers[-1]
    return x @ W + b


def softmax(z, axis=-1):
    z = z - z.max(axis=axis, keepdims=True)
    e = np.exp(z)
    return e / e.sum(axis=axis, keepdims=True)


def mlp_select(x, mask, layers, act=None):
    """S = softmax(MLP(X)) with padded rows zeroed (reference:
    tgp/select/mlp_select.py:96-157 — the dense select applies the mask)."""
    s = softmax(mlp(x, layers, act))
    return s * mask[..., None]


def reduce_pool(x, s):
    """X' = SᵀX (reference: tgp/reduce/base_reduce.py:141-155)."""
    return np.einsum("bnk,bnf->bkf", s, x)


def dense_connect(adj, s):
    """A' = SᵀAS (reference: tgp/connect/dense_conn.py:113-124)."""
    return np.einsum("bnk,bnm,bmj->bkj", s, adj, s)


def postprocess_adj(adj, remove_self_loops=False, degree_norm=False,
                    adj_transpose=False, edge_weight_norm=False):
    """Transcribed from ``postprocess_adj_pool_dense``
    (reference: tgp/utils/ops.py:282-335): zero diagonal; D^{-1/2} A D^{-1/2}
    with d = row sums (col sums when transposed) clamped at eps; per-graph
    max-|w| normalization."""
    adj = adj.copy()
    B, K, _ = adj.shape
    if remove_self_loops:
        idx = np.arange(K)
        adj[:, idx, idx] = 0.0
    if degree_norm:
        d = adj.sum(-2, keepdims=True) if adj_transpose else adj.sum(-1, keepdims=True)
        d = np.sqrt(np.clip(d, EPS, None))
        adj = (adj / d) / np.swapaxes(d, -1, -2)
    if edge_weight_norm:
        mx = np.abs(adj.reshape(B, -1)).max(axis=1)
        mx = np.where(mx == 0, 1.0, mx)
        adj = adj / mx[:, None, None]
    return adj


# ---------------------------------------------------------------------------
# Loss formulas (reference: tgp/utils/losses.py, cited per function)
# ---------------------------------------------------------------------------


def mincut_loss(adj, s, adj_pooled):
    """-Tr(SᵀAS)/Tr(SᵀDS) per graph, mean (losses.py:39-84)."""
    num = np.trace(adj_pooled, axis1=-2, axis2=-1)
    d = adj.sum(-1)
    den = np.einsum("bnk,bn,bnk->b", s, d, s)
    return float(np.mean(-(num / (den + EPS))))


def orthogonality_loss(s):
    """‖SᵀS/‖SᵀS‖_F − I/√K‖_F per graph, mean (losses.py:87-123)."""
    sts = np.einsum("bnk,bnj->bkj", s, s)
    nrm = np.linalg.norm(sts, axis=(-2, -1), keepdims=True)
    k = s.shape[-1]
    term = sts / nrm - np.eye(k) / math.sqrt(k)
    return float(np.mean(np.linalg.norm(term, axis=(-2, -1))))


def link_pred_loss(s, adj, normalize_loss=False):
    """Global ‖A − SSᵀ‖_F, optionally / A.numel (losses.py:644-679)."""
    diff = adj - np.einsum("bnk,bmk->bnm", s, s)
    loss = np.linalg.norm(diff.ravel())
    if normalize_loss:
        loss = loss / adj.size
    return float(loss)


def entropy_loss(s, num_nodes):
    """Σ per-node entropy / num_nodes (losses.py:476-500, :682-708)."""
    ent = -(s * np.log(s + EPS)).sum(-1)
    return float(ent.sum() / num_nodes)


def spectral_loss(adj, s, adj_pooled, mask):
    """DMoN modularity term (losses.py:1083-1148)."""
    deg = adj.sum(-1) * mask
    m = deg.sum(-1) / 2
    safe_m = np.where(m > 0, m, 1.0)
    ca = np.einsum("bnk,bn->bk", s, deg)
    ntr = (ca * ca).sum(-1) / (2 * safe_m)
    tr = np.trace(adj_pooled, axis1=-2, axis2=-1)
    loss = -(tr - ntr) / (2 * safe_m)
    return float(np.mean(np.where(m > 0, loss, 0.0)))


def cluster_loss(s, mask):
    """‖Σ_n S_n‖ / n_g · √K − 1 per graph, mean (losses.py:1216-1265)."""
    k = s.shape[-1]
    cs = s.sum(-2)
    loss = np.linalg.norm(cs, axis=-1) / mask.sum(-1) * math.sqrt(k) - 1
    return float(np.mean(loss))


def hosc_orthogonality_loss(s, mask):
    """(√K − Σ_k‖S_:k‖/√n) / (√K − 1) per graph, mean (losses.py:597-641)."""
    k = s.shape[-1]
    if k <= 1:
        return 0.0
    norm = np.sqrt((s * s).sum(-2)).sum(-1)
    sq_n = np.sqrt(mask.sum(-1).astype(np.float64))
    return float(np.mean((math.sqrt(k) - norm / sq_n) / (math.sqrt(k) - 1)))


def just_balance_loss(s, mask, normalize_loss=True):
    """−Tr √(SᵀS + eps), per-graph normalized by √(n_g·K) (losses.py:1013-1080)."""
    k = s.shape[-1]
    ss = np.einsum("bnk,bnj->bkj", s, s)
    tr = np.trace(np.sqrt(ss + EPS), axis1=-2, axis2=-1)
    loss = -tr
    if normalize_loss:
        loss = loss / np.sqrt(mask.sum(-1).astype(np.float64) * k)
    return float(np.mean(loss))


def totvar_loss(s, adj):
    """Σ_ij a_ij |S_i − S_j|₁ / (2 E_g) per graph, mean (losses.py:780-862)."""
    l1 = np.abs(s[:, :, None, :] - s[:, None, :, :]).sum(-1)
    loss = (adj * l1).sum((-2, -1))
    n_edges = (adj != 0).sum((-2, -1))
    return float(np.mean(loss / (2 * np.maximum(n_edges, 1))))


def asym_norm_loss(s, k, mask):
    """ρ-quantile balance loss, per graph over valid rows (losses.py:920-1010
    masked path delegates to the unbatched loop :503-550)."""
    if k <= 1:
        return 0.0
    losses = []
    for b in range(s.shape[0]):
        sg = s[b][mask[b]]
        n = sg.shape[0]
        idx = min(int(math.floor(n / k)), n - 1)
        quant = -np.sort(-sg, axis=0)[idx, :]
        diff = sg - quant[None, :]
        asym = np.where(diff >= 0, (k - 1) * diff, -diff)
        inner = asym.sum()
        losses.append((n * (k - 1) - inner) / (n * (k - 1)))
    return float(np.mean(losses))


def maxcut_loss(scores, graphs):
    """zᵀAz / vol per graph, mean (losses.py:1565-1670).  ``scores`` is a list
    of per-graph [n] vectors."""
    vals = []
    for z, g in zip(scores, graphs):
        ei = np.asarray(g[1])
        ew = np.asarray(g[2], np.float64) if len(g) > 2 else np.ones(ei.shape[1])
        n = g[0].shape[0]
        adj = np.zeros((n, n))
        np.add.at(adj, (ei[0], ei[1]), ew)
        cut = z @ adj @ z
        vol = ew.sum()
        vals.append(cut / (vol if vol != 0 else 1.0))
    return float(np.mean(vals))


# ---------------------------------------------------------------------------
# Per-pooler dense-family oracles
# (forward skeleton: reference tgp/poolers/mincut.py:150-289 and twins)
# ---------------------------------------------------------------------------


def run_dense_pooler(alias, graphs, layers, k, *, act=None,
                     remove_self_loops=True, degree_norm=True,
                     edge_weight_norm=False, n_max=None, **hyp):
    """Run the reference dense-pooler forward math for ``alias``.

    Returns dict with s, x_pool, adj_pool (postprocessed) and loss_* scalars.
    ``layers``: MLP weights [(W,b),...] in flax layout ([in,out] kernels).
    """
    x, adj, mask = dense_batch(graphs, n_max=n_max)
    s = mlp_select(x, mask, layers, act)
    x_pool = reduce_pool(x, s)
    adj_pool_raw = dense_connect(adj, s)

    loss = {}
    if alias == "mincut":
        # reference: tgp/poolers/mincut.py:291-311
        loss["cut_loss"] = hyp.get("cut_loss_coeff", 1.0) * mincut_loss(
            adj, s, adj_pool_raw)
        loss["ortho_loss"] = hyp.get("ortho_loss_coeff", 1.0) * (
            orthogonality_loss(s))
    elif alias == "diff":
        # reference: tgp/poolers/diffpool.py:211-285 (num_nodes = mask.sum())
        loss["link_loss"] = hyp.get("link_loss_coeff", 1.0) * link_pred_loss(
            s, adj, normalize_loss=hyp.get("normalize_loss", False))
        loss["entropy_loss"] = hyp.get("ent_loss_coeff", 1.0) * entropy_loss(
            s, int(mask.sum()))
    elif alias == "dmon":
        # reference: tgp/poolers/dmon.py:262-288
        loss["spectral_loss"] = hyp.get("spectral_loss_coeff", 1.0) * (
            spectral_loss(adj, s, adj_pool_raw, mask))
        loss["cluster_loss"] = hyp.get("cluster_loss_coeff", 1.0) * (
            cluster_loss(s, mask))
        loss["ortho_loss"] = hyp.get("ortho_loss_coeff", 0.0) * (
            orthogonality_loss(s))
    elif alias == "hosc":
        # reference: tgp/poolers/hosc.py:269-315
        alpha, mu = hyp.get("alpha", 0.5), hyp.get("mu", 0.1)
        motif = np.einsum("bij,bjk,bkl->bil", adj, adj, adj)
        motif_pool = dense_connect(motif, s)
        cut = mincut_loss(adj, s, adj_pool_raw) / k if alpha < 1 else 0.0
        ho = mincut_loss(motif, s, motif_pool) / k if alpha > 0 else 0.0
        loss["hosc_loss"] = (1 - alpha) * cut + alpha * ho
        ortho = (hosc_orthogonality_loss(s, mask) if hyp.get("hosc_ortho")
                 else orthogonality_loss(s)) if mu != 0 else 0.0
        loss["ortho_loss"] = mu * ortho
    elif alias == "jb":
        # reference: tgp/poolers/just_balance.py:244-270
        loss["balance_loss"] = hyp.get("loss_coeff", 1.0) * just_balance_loss(
            s, mask, normalize_loss=hyp.get("normalize_loss", True))
    elif alias == "acc":
        # reference: tgp/poolers/asym_cheeger_cut.py:96-150
        loss["total_variation_loss"] = hyp.get("totvar_coeff", 1.0) * (
            totvar_loss(s, adj))
        loss["balance_loss"] = hyp.get("balance_coeff", 1.0) * (
            asym_norm_loss(s, k, mask))
    else:
        raise ValueError(f"unknown dense alias {alias!r}")

    adj_pool = postprocess_adj(
        adj_pool_raw, remove_self_loops=remove_self_loops,
        degree_norm=degree_norm, edge_weight_norm=edge_weight_norm)
    out = {"s": s, "x_pool": x_pool, "adj_pool": adj_pool}
    out.update({f"loss_{n}": v for n, v in loss.items()})
    return out


# ---------------------------------------------------------------------------
# Top-k family (reference: tgp/select/topk_select.py:169-207 + PyG ``topk``;
# pooler skeleton tgp/poolers/topk.py:150-216)
# ---------------------------------------------------------------------------


def topk_perm(score, ratio, min_score=None, tol=1e-7):
    """PyG ``topk`` per single graph: indices of kept nodes, sorted by
    descending score (transcribed from
    torch_geometric.nn.pool.select.topk semantics)."""
    n = score.shape[0]
    order = np.argsort(-score, kind="stable")
    if min_score is not None:
        thr = min(score.max() - tol, min_score)
        keep = order[score[order] > thr]
        return keep
    if isinstance(ratio, int) and ratio >= 1:
        k = min(ratio, n)
    else:
        k = max(int(math.ceil(ratio * n)), 1)
    return order[:k]


def run_topk_family(graphs, score_fn, ratio=0.5, min_score=None,
                    multiplier=1.0, k_max=None, remove_self_loops=True,
                    degree_norm=False):
    """Shared top-k pooler forward: per-graph selection, score-gated reduce
    (reference: tgp/reduce/base_reduce.py:139-160 sparse path), induced
    subgraph connect (tgp/connect/base_conn.py:57-112 partial path).

    ``score_fn(g) -> [n]`` produces the per-graph score (already activated /
    softmaxed).  Outputs are padded to ``[B, k_max, ...]`` with supernode
    slot = rank by descending score (the JAX package's graph-major layout;
    an internal relabeling of the reference's compacted ordering).
    """
    B = len(graphs)
    n_max = max(g[0].shape[0] for g in graphs)
    if k_max is None:
        if min_score is not None:
            k_max = n_max
        elif isinstance(ratio, int) and ratio >= 1:
            k_max = min(ratio, n_max)
        else:
            k_max = max(int(math.ceil(ratio * n_max)), 1)
    F = graphs[0][0].shape[1]
    x_pool = np.zeros((B, k_max, F))
    adj_pool = np.zeros((B, k_max, k_max))
    mask_pool = np.zeros((B, k_max), dtype=bool)
    weights = np.zeros((B, k_max))
    for b, g in enumerate(graphs):
        xg = np.asarray(g[0], np.float64)
        ei = np.asarray(g[1])
        ew = np.asarray(g[2], np.float64) if len(g) > 2 else np.ones(ei.shape[1])
        score = (score_fn[b] if isinstance(score_fn, (list, tuple))
                 else score_fn(g))
        perm = topk_perm(score, ratio, min_score)
        kk = perm.shape[0]
        x_pool[b, :kk] = xg[perm] * score[perm][:, None] * multiplier
        mask_pool[b, :kk] = True
        weights[b, :kk] = score[perm]
        # induced subgraph relabeled to rank slots
        inv = -np.ones(xg.shape[0], dtype=np.int64)
        inv[perm] = np.arange(kk)
        for e in range(ei.shape[1]):
            si, ri = inv[ei[0, e]], inv[ei[1, e]]
            if si >= 0 and ri >= 0:
                if remove_self_loops and si == ri:
                    continue
                adj_pool[b, si, ri] += ew[e]
    if degree_norm:
        adj_pool = postprocess_adj(adj_pool, degree_norm=True)
    return {"x_pool": x_pool, "adj_pool": adj_pool, "mask": mask_pool,
            "weight": weights}


def topk_score_fn(w, act="tanh", min_score=None):
    """TopkSelect scoring: y = act(X·w/‖w‖) or softmax(X·w) per graph
    (reference: tgp/select/topk_select.py:169-199)."""
    def fn(g):
        x = np.asarray(g[0], np.float64)
        score = x @ w
        if min_score is None:
            score = score / np.linalg.norm(w)
            return ACTS[act](score) if act else score
        return softmax(score, axis=0)
    return fn


def graph_conv(g, w_root, b_root, w_neigh, out_x=None):
    """PyG ``GraphConv``: X' = (X W_root + b) + (A X) W_neigh, where
    (A X)_i = Σ_{j→i} w_ji x_j (reference: SAG scorer, tgp/poolers/sag.py:143)."""
    x = np.asarray(g[0], np.float64) if out_x is None else out_x
    ei = np.asarray(g[1])
    ew = np.asarray(g[2], np.float64) if len(g) > 2 else np.ones(ei.shape[1])
    n = x.shape[0]
    ax = np.zeros_like(x)
    np.add.at(ax, ei[1], x[ei[0]] * ew[:, None])
    return x @ w_root + b_root + ax @ w_neigh


def sag_score_fn(w_root, b_root, w_neigh, act="tanh", min_score=None):
    def fn(g):
        score = graph_conv(g, w_root, b_root, w_neigh)[:, 0]
        if min_score is None:
            return ACTS[act](score) if act else score
        return softmax(score, axis=0)
    return fn


def pan_score_fn(p, beta, act="tanh", min_score=None):
    """PANPooling score: β₀(X·p) + β₁·colsum(M) (reference:
    tgp/poolers/pan.py:150-162; M arrives as the graph's edge weights)."""
    def fn(g):
        x = np.asarray(g[0], np.float64)
        ei = np.asarray(g[1])
        ew = np.asarray(g[2], np.float64) if len(g) > 2 else np.ones(ei.shape[1])
        deg = np.zeros(x.shape[0])
        np.add.at(deg, ei[1], ew)
        score = beta[0] * (x @ p) + beta[1] * deg
        if min_score is None:
            return ACTS[act](score) if act else score
        return softmax(score, axis=0)
    return fn


# ---------------------------------------------------------------------------
# ASAP (reference: tgp/poolers/asap.py:21-267)
# ---------------------------------------------------------------------------


def leaky_relu(v, slope=0.2):
    return np.where(v >= 0, v, slope * v)


def with_self_loops(g, fill=1.0):
    """add_remaining_self_loops(fill_value=1.0) (torch_geometric.utils)."""
    x = np.asarray(g[0], np.float64)
    ei = np.asarray(g[1])
    ew = np.asarray(g[2], np.float64) if len(g) > 2 else np.ones(ei.shape[1])
    n = x.shape[0]
    has_loop = np.zeros(n, dtype=bool)
    has_loop[ei[0][ei[0] == ei[1]]] = True
    missing = np.nonzero(~has_loop)[0]
    ei2 = np.concatenate([ei, np.stack([missing, missing])], axis=1)
    ew2 = np.concatenate([ew, np.full(missing.shape[0], fill)])
    return x, ei2, ew2


def leconv(x, ei, ew, W_a, b_a, W_b, W_root, b_root):
    """PyG ``LEConv``: x'_i = W₃x_i + b₃ + Σ_{j→i} w_ji ((W₁x_j + b₁) − W₂x_i)
    (reference: ASAP select scorer, tgp/poolers/asap.py:54)."""
    a = x @ W_a + b_a
    b = x @ W_b
    root = x @ W_root + b_root
    agg = np.zeros_like(root)
    np.add.at(agg, ei[1], ew[:, None] * (a[ei[0]] - b[ei[1]]))
    return root + agg


def asap_cluster_features(g, W_lin, b_lin, W_att, b_att, negative_slope=0.2):
    """ASAP ego-network attention → master-node features (reference:
    tgp/poolers/asap.py:206-235): max-pooled query, per-edge attention
    softmax over receivers, weighted sum of sender features."""
    x, ei, ew = with_self_loops(g)
    n = x.shape[0]
    x_q = np.full_like(x, -np.inf)
    np.maximum.at(x_q, ei[1], x[ei[0]])
    x_q = np.where(np.isfinite(x_q), x_q, 0.0)
    x_q = x_q @ W_lin + b_lin
    score = (np.concatenate([x_q[ei[1]], x[ei[0]]], -1) @ W_att + b_att)[:, 0]
    score = leaky_relu(score, negative_slope)
    # softmax per receiver
    mx = np.full(n, -np.inf)
    np.maximum.at(mx, ei[1], score)
    e = np.exp(score - mx[ei[1]])
    den = np.zeros(n)
    np.add.at(den, ei[1], e)
    attn = e / den[ei[1]]
    x_c = np.zeros_like(x)
    np.add.at(x_c, ei[1], x[ei[0]] * attn[:, None])
    return x_c, ei, ew


def run_asap(graphs, W_lin, b_lin, W_att, b_att, le, ratio=0.5,
             negative_slope=0.2, k_max=None):
    """Full ASAP forward (reference: tgp/poolers/asap.py:160-267).  ``le`` is
    the LEConv weight tuple (W_a, b_a, W_b, W_root, b_root)."""
    out_graphs, fits = [], []
    for g in graphs:
        x_c, ei, ew = asap_cluster_features(
            g, W_lin, b_lin, W_att, b_att, negative_slope)
        fit = 1.0 / (1.0 + np.exp(-leconv(x_c, ei, ew, *le)[:, 0]))
        fits.append(fit)
        # top-k on fitness over the *clustered* features; connect = induced
        # subgraph of the original (non-self-loop) edges
        out_graphs.append((x_c,) + tuple(g[1:]))
    return run_topk_family(out_graphs, fits, ratio=ratio, k_max=k_max)


# ---------------------------------------------------------------------------
# EdgeContraction (reference: tgp/select/edge_contraction_select.py:14-249)
# ---------------------------------------------------------------------------


def maximal_matching(ei, n, rank):
    """Greedy maximal matching in edge-rank order — transcription of the
    reference's sentinel scatter-min loop (edge_contraction_select.py:
    ``maximal_matching``)."""
    m = ei.shape[1]
    match = np.zeros(m, dtype=bool)
    mask = np.ones(m, dtype=bool)
    while mask.any():
        node_rank = np.full(n, n * n, dtype=np.int64)
        np.minimum.at(node_rank, ei[0][mask], rank[mask])
        np.minimum.at(node_rank, ei[1][mask], rank[mask])
        edge_rank = np.minimum(node_rank[ei[0]], node_rank[ei[1]])
        match = match | (rank == edge_rank)
        unmatched = np.ones(n, dtype=bool)
        unmatched[ei[0][match]] = False
        unmatched[ei[1][match]] = False
        mask = mask & unmatched[ei[0]] & unmatched[ei[1]]
    return match


def run_ec(graphs, W_lin, b_lin, method="softmax", add_to_edge_score=0.5,
           k_max=None, remove_self_loops=True):
    """EdgeContraction pooler forward (reference: tgp/poolers/
    edge_contraction.py + select).  Supernode slot = the root (sender-side)
    node's position — the JAX package's uncompacted cluster-id layout."""
    B = len(graphs)
    n_max = max(g[0].shape[0] for g in graphs) if k_max is None else k_max
    F = graphs[0][0].shape[1]
    x_pool = np.zeros((B, n_max, F))
    adj_pool = np.zeros((B, n_max, n_max))
    mask_pool = np.zeros((B, n_max), dtype=bool)
    for b, g in enumerate(graphs):
        x = np.asarray(g[0], np.float64)
        ei = np.asarray(g[1])
        ew = np.asarray(g[2], np.float64) if len(g) > 2 else np.ones(ei.shape[1])
        n = x.shape[0]
        e = np.concatenate([x[ei[0]], x[ei[1]]], -1) @ W_lin + b_lin
        e = e[:, 0]
        if method == "softmax":
            mx = np.full(n, -np.inf)
            np.maximum.at(mx, ei[1], e)
            ex = np.exp(e - mx[ei[1]])
            den = np.zeros(n)
            np.add.at(den, ei[1], ex)
            e = ex / den[ei[1]]
        elif method == "tanh":
            e = np.tanh(e)
        elif method == "sigmoid":
            e = 1.0 / (1.0 + np.exp(-e))
        e = e + add_to_edge_score
        perm = np.argsort(-e, kind="stable")
        rank = np.zeros(ei.shape[1], dtype=np.int64)
        rank[perm] = np.arange(ei.shape[1])
        match = maximal_matching(ei, n, rank)
        cluster = np.arange(n)
        cluster[ei[1][match]] = ei[0][match]
        # per-node weight = its cluster's edge score (1 for singletons)
        w_cluster = np.ones(n)
        w_cluster[cluster[ei[0][match]]] = e[match]
        weight = w_cluster[cluster]
        roots = np.unique(cluster)
        np.add.at(x_pool[b], cluster, x * weight[:, None])
        mask_pool[b, roots] = True
        cs, cr = cluster[ei[0]], cluster[ei[1]]
        keep = ~(remove_self_loops & (cs == cr))
        np.add.at(adj_pool[b], (cs[keep], cr[keep]), ew[keep])
    return {"x_pool": x_pool, "adj_pool": adj_pool, "mask": mask_pool}


# ---------------------------------------------------------------------------
# NDP / Kron reduction (reference: tgp/connect/kron_conn.py:117-168 +
# select/ndp_select.py:155-258)
# ---------------------------------------------------------------------------


def kron_pool_adj(g, idx_pos, sparse_threshold=1e-2):
    """Pooled adjacency by Kron reduction, dense transcription:
    L' = L_pp − L_pn L_nn⁻¹ L_np, A' = −L', |w|≤threshold pruned, zero diag."""
    ei = np.asarray(g[1])
    ew = np.asarray(g[2], np.float64) if len(g) > 2 else np.ones(ei.shape[1])
    n = g[0].shape[0]
    A = np.zeros((n, n))
    np.add.at(A, (ei[0], ei[1]), ew)
    L = np.diag(A.sum(-1)) - A
    idx_pos = np.asarray(idx_pos)
    idx_neg = np.setdiff1d(np.arange(n), idx_pos)
    if len(idx_pos) <= 1:
        Lnew = -np.ones((1, 1))
    elif len(idx_neg) == 0:
        Lnew = L[np.ix_(idx_pos, idx_pos)]
    else:
        Lpp = L[np.ix_(idx_pos, idx_pos)]
        Lpn = L[np.ix_(idx_pos, idx_neg)]
        Lnp = L[np.ix_(idx_neg, idx_pos)]
        Lnn = L[np.ix_(idx_neg, idx_neg)]
        try:
            sol = np.linalg.solve(Lnn, Lnp)
        except np.linalg.LinAlgError:
            sol = np.linalg.solve(Lnn + np.eye(len(idx_neg)) * 1e-6, Lnp)
        Lnew = Lpp - Lpn @ sol
        Lnew = (Lnew + Lnew.T) / 2.0
    A_pool = -Lnew
    if sparse_threshold > 0:
        A_pool = A_pool * (np.abs(A_pool) > sparse_threshold)
    np.fill_diagonal(A_pool, 0.0)
    return A_pool


def eval_cut(g, z):
    """Normalized cut size zᵀLz / (2·vol) (reference: ndp_select.py:155-172)."""
    ei = np.asarray(g[1])
    ew = np.asarray(g[2], np.float64) if len(g) > 2 else np.ones(ei.shape[1])
    n = g[0].shape[0]
    A = np.zeros((n, n))
    np.add.at(A, (ei[0], ei[1]), ew)
    L = np.diag(A.sum(-1)) - A
    return (z @ L @ z) / (2 * ew.sum())


# ---------------------------------------------------------------------------
# Total-assignment downstream math (graclus/sep-style: given a matching or
# cluster map, reduce = sum within cluster, connect = coalesced relabel;
# reference: tgp/reduce/base_reduce.py sparse path + connect/base_conn.py)
# ---------------------------------------------------------------------------


def pool_given_clusters(g, cluster, weight=None, k_max=None,
                        remove_self_loops=True):
    """X'[c] = Σ_{i∈c} w_i x_i ; A'[c,d] = Σ_{(i,j)} w_ij over relabeled
    edges (self-loops optionally dropped).  ``cluster`` maps node → slot."""
    x = np.asarray(g[0], np.float64)
    ei = np.asarray(g[1])
    ew = np.asarray(g[2], np.float64) if len(g) > 2 else np.ones(ei.shape[1])
    if k_max is None:
        k_max = int(cluster.max()) + 1
    if weight is None:
        weight = np.ones(x.shape[0])
    x_pool = np.zeros((k_max, x.shape[1]))
    np.add.at(x_pool, cluster, x * weight[:, None])
    adj = np.zeros((k_max, k_max))
    cs, cr = cluster[ei[0]], cluster[ei[1]]
    keep = ~(remove_self_loops & (cs == cr))
    np.add.at(adj, (cs[keep], cr[keep]), ew[keep])
    return x_pool, adj


# ---------------------------------------------------------------------------
# EigenPool (reference: tgp/select/eigenpool_select.py:17-153,
# reduce/eigenpool_reduce.py, connect/eigenpool_conn.py)
# ---------------------------------------------------------------------------


def eigen_theta(g, labels, num_modes, K):
    """Θ [N, H·K]: per-cluster normalized-Laplacian eigenvectors, modes
    beyond n−1 repeat the last, sign flip iff first entry < 0, singleton
    clusters write their self-loop weight."""
    ei = np.asarray(g[1])
    ew = np.asarray(g[2], np.float64) if len(g) > 2 else np.ones(ei.shape[1])
    n = g[0].shape[0]
    A = np.zeros((n, n))
    np.add.at(A, (ei[0], ei[1]), ew)
    A = np.maximum(A, A.T)
    theta = np.zeros((n, num_modes * K))
    for c in np.unique(labels):
        nodes = np.nonzero(labels == c)[0]
        Ac = A[np.ix_(nodes, nodes)]
        if nodes.size == 1:
            theta[nodes[0], c::K] = float(Ac[0, 0])
            continue
        d = Ac.sum(0) + np.spacing(np.float64(0))
        dis = 1.0 / np.sqrt(d)
        L = np.eye(nodes.size) - dis[:, None] * Ac * dis[None, :]
        _, v = np.linalg.eigh(L)
        for h in range(num_modes):
            col = v[:, min(h, nodes.size - 1)]
            if col[0] < 0:
                col = -col
            theta[nodes, h * K + c] = col
    return theta, A


def run_eigen_given_labels(g, labels, num_modes, K, remove_self_loops=True,
                           degree_norm=True):
    """EigenPool downstream given cluster labels: x' = mode-major reshape of
    Θᵀx → [K, H·F]; A' = Ωᵀ(A − A_int)Ω postprocessed."""
    theta, A = eigen_theta(g, labels, num_modes, K)
    x = np.asarray(g[0], np.float64)
    raw = theta.T @ x  # [H·K, F]
    F = x.shape[1]
    x_pool = raw.reshape(num_modes, K, F).transpose(1, 0, 2).reshape(
        K, num_modes * F)
    omega = np.zeros((labels.shape[0], K))
    omega[np.arange(labels.shape[0]), labels] = 1.0
    inter = A * (labels[:, None] != labels[None, :])
    adj = omega.T @ inter @ omega
    adj = postprocess_adj(adj[None], remove_self_loops=remove_self_loops,
                          degree_norm=degree_norm)[0]
    return {"theta": theta, "x_pool": x_pool, "adj_pool": adj}


# ---------------------------------------------------------------------------
# BNPool (reference: tgp/poolers/bnpool.py:141-557 + select/dp_select.py)
# ---------------------------------------------------------------------------


def stick_breaking(z):
    """π from stick fractions (reference: dp_select.py
    ``_compute_pi_given_sticks``): log-space cumulative product."""
    out = np.zeros(z.shape[:-1] + (z.shape[-1] + 1,))
    out[..., :-1] = np.log(z)
    out[..., 1:] += np.cumsum(np.log(1 - z), axis=-1)
    return np.exp(out)


def dp_posterior(x, layers, act=None):
    """(α, β) = split(clamp(softplus(MLP(x)), 1e-3, 1e3)) (reference:
    dp_select.py ``_inner_forward``)."""
    out = mlp(x, layers, act)
    out = np.clip(np.log1p(np.exp(-np.abs(out))) + np.maximum(out, 0),
                  1e-3, 1e3)  # stable softplus
    a, b = np.split(out, 2, axis=-1)
    return a, b


def beta_kl(a_q, b_q, a_p, b_p):
    """KL(Beta(a_q,b_q) ‖ Beta(a_p,b_p)) — torch.distributions closed form."""
    from scipy.special import betaln, digamma

    return (betaln(a_p, b_p) - betaln(a_q, b_q)
            + (a_q - a_p) * digamma(a_q)
            + (b_q - b_p) * digamma(b_q)
            + (a_p - a_q + b_p - b_q) * digamma(a_q + b_q))


def bnpool_losses(s, adj, mask, K, a_q, b_q, alpha_DP=1.0, K_mu=10.0,
                  K_var=1.0, eta=1.0, train_K=True):
    """BNPool batched loss trio given assignments S and posterior (α, β)
    (reference: tgp/poolers/bnpool.py ``compute_loss`` +
    losses.py weighted_bce/kl/cluster_connectivity_prior)."""
    B, n, k = s.shape
    rec_adj = np.einsum("bnk,kj,bmj->bnm", s, K, s)
    N = mask.sum(-1)
    N2 = (N ** 2).astype(np.float64)
    # class-balanced BCE (losses.py:1268-1356)
    logits, targets = rec_adj, adj
    bce = np.maximum(logits, 0) - logits * targets + np.log1p(
        np.exp(-np.abs(logits)))
    edge_mask = (adj != 0) & mask[:, :, None] & mask[:, None, :]
    n_edges = edge_mask.sum((-1, -2))
    n_not = np.clip(N2 - n_edges, 1, None)
    balance = n_not / np.clip(n_edges, 1, None)
    bce = np.where(edge_mask, bce * balance[:, None, None], bce)
    bce = bce * mask[:, :, None] * mask[:, None, :]
    rec_loss = float(np.mean(bce.sum((-1, -2)) / N2))
    # KL (losses.py:1359-1443)
    kl_n = beta_kl(a_q, b_q, np.ones(k - 1), np.ones(k - 1) * alpha_DP).sum(-1)
    kl = float(np.mean((kl_n * mask).sum(-1) / N2))
    # K prior (losses.py:1446-1517)
    if train_K:
        eye = np.eye(k)
        K_mu_mat = K_mu * eye - K_mu * (1 - eye)
        prior = (0.5 * (K - K_mu_mat) ** 2 / K_var).sum()
        kp = float(np.mean(prior / B / N2))
    else:
        kp = 0.0
    return {"quality": rec_loss, "kl": eta * kl, "K_prior": kp}


# ---------------------------------------------------------------------------
# k-MIS (reference: tgp/select/kmis_select.py:35-388 + poolers/kmis.py)
# ---------------------------------------------------------------------------


def kmis_mis_cluster(ei, n, rank, order_k=1):
    """Transcription of ``maximal_independent_set_cluster``: greedy k-MIS in
    rank order, then every node joins the min-rank MIS member within k hops."""
    def khop_min(vals):
        for _ in range(order_k):
            nxt = np.full(n, n, dtype=np.int64)
            np.minimum.at(nxt, ei[1], vals[ei[0]])
            vals = np.minimum(nxt, vals)
        return vals

    mis = np.zeros(n, dtype=bool)
    mask = np.zeros(n, dtype=bool)
    min_rank = rank.copy()
    while not mask.all():
        mr = khop_min(min_rank)
        mis = mis | (rank == mr)
        mask = mis.copy()
        for _ in range(order_k):
            nxt = np.zeros(n, dtype=bool)
            np.maximum.at(nxt, ei[1], mask[ei[0]])
            mask = mask | nxt
        min_rank = np.where(mask, n, rank)
    min_rank = np.where(mis, rank, n)
    min_rank = khop_min(min_rank)
    # representative node of each cluster (rank → node lookup)
    inv = np.zeros(n + 1, dtype=np.int64)
    inv[np.minimum(rank, n)] = np.arange(n)
    cluster = inv[np.minimum(min_rank, n)]
    cluster = np.where(min_rank >= n, np.arange(n), cluster)
    return mis, cluster


def run_kmis(graphs, W_lin, b_lin, order_k=1, score_heuristic="greedy",
             k_max=None, remove_self_loops=True):
    """KMIS pooler forward: linear-sigmoid scores, greedy heuristic
    score/k-hop-sums, rank by descending score, k-MIS cluster, score-weighted
    reduce, coalesced connect.  Supernode slot = representative node position
    (the JAX package's uncompacted layout)."""
    B = len(graphs)
    if k_max is None:
        k_max = max(g[0].shape[0] for g in graphs)
    F = graphs[0][0].shape[1]
    x_pool = np.zeros((B, k_max, F))
    adj_pool = np.zeros((B, k_max, k_max))
    mask_pool = np.zeros((B, k_max), dtype=bool)
    for b, g in enumerate(graphs):
        x = np.asarray(g[0], np.float64)
        ei = np.asarray(g[1])
        ew = np.asarray(g[2], np.float64) if len(g) > 2 else np.ones(ei.shape[1])
        n = x.shape[0]
        score = 1.0 / (1.0 + np.exp(-(x @ W_lin + b_lin)[:, 0]))
        if score_heuristic == "greedy":
            k_sums = np.ones(n)
        elif score_heuristic == "w-greedy":
            k_sums = score.copy()
        else:
            k_sums = None
        upd = score.copy()
        if k_sums is not None:
            for _ in range(order_k):
                add = np.zeros(n)
                np.add.at(add, ei[1], k_sums[ei[0]])
                k_sums = k_sums + add
            upd = score / k_sums
        order = np.argsort(-upd, kind="stable")
        rank = np.zeros(n, dtype=np.int64)
        rank[order] = np.arange(n)
        mis, cluster = kmis_mis_cluster(ei, n, rank, order_k)
        np.add.at(x_pool[b], cluster, x * score[:, None])
        mask_pool[b, np.nonzero(mis)[0]] = True
        cs, cr = cluster[ei[0]], cluster[ei[1]]
        keep = ~(remove_self_loops & (cs == cr))
        np.add.at(adj_pool[b], (cs[keep], cr[keep]), ew[keep])
    return {"x_pool": x_pool, "adj_pool": adj_pool, "mask": mask_pool}


# ---------------------------------------------------------------------------
# LaPool (reference: tgp/select/lapool_select.py:81-426 + poolers/lapool.py)
# ---------------------------------------------------------------------------


def run_lapool(graphs, shortest_path_reg=False, k_max=None,
               remove_self_loops=True, degree_norm=True):
    """LaPool forward: Laplacian-signal leaders (v = ‖deg·x − Ax‖, leader iff
    v_i ≥ max over neighbors), cosine-softmax follower assignment, optional
    β = 1/shortest-path regularization applied AFTER the softmax, leaders
    one-hot; then SᵀX / SᵀAS + postprocess."""
    from scipy.sparse import csr_matrix
    from scipy.sparse.csgraph import shortest_path as sp_dist

    B = len(graphs)
    if k_max is None:
        k_max = max(g[0].shape[0] for g in graphs)
    F = graphs[0][0].shape[1]
    s_out = []
    x_pool = np.zeros((B, k_max, F))
    adj_pool = np.zeros((B, k_max, k_max))
    mask_pool = np.zeros((B, k_max), dtype=bool)
    for b, g in enumerate(graphs):
        x = np.asarray(g[0], np.float64)
        ei = np.asarray(g[1])
        ew = np.asarray(g[2], np.float64) if len(g) > 2 else np.ones(ei.shape[1])
        n = x.shape[0]
        A = np.zeros((n, n))
        np.add.at(A, (ei[0], ei[1]), ew)
        deg = A.sum(-1)
        v = np.linalg.norm(deg[:, None] * x - A @ x, axis=-1)
        nbr = np.where(A != 0, v[None, :], -np.inf).max(-1)
        leader = v >= nbr
        lead_idx = np.nonzero(leader)[0]
        k = lead_idx.shape[0]
        xl = x[lead_idx]
        cos = (x @ xl.T) / (
            np.linalg.norm(x, axis=-1, keepdims=True)
            * np.linalg.norm(xl, axis=-1)[None, :] + 1e-8)
        s = softmax(cos, axis=-1)
        if shortest_path_reg and ei.size:
            spm = csr_matrix((np.ones(ei.shape[1]), (ei[0], ei[1])),
                             shape=(n, n))
            dist = sp_dist(spm, directed=False, unweighted=True)
            beta = np.zeros((n, n))
            nz = dist != 0
            with np.errstate(divide="ignore"):
                beta[nz] = 1.0 / dist[nz]
            beta[~np.isfinite(beta)] = 0.0
            s = beta[:, lead_idx] * s
        s[lead_idx] = np.eye(k)[np.arange(k)]
        s_full = np.zeros((n, k_max))
        s_full[:, :k] = s
        s_out.append(s_full)
        x_pool[b] = s_full.T @ x
        adj_pool[b] = s_full.T @ A @ s_full
        mask_pool[b, :k] = True
    adj_pool = postprocess_adj(adj_pool, remove_self_loops=remove_self_loops,
                               degree_norm=degree_norm)
    adj_pool *= mask_pool[:, :, None] * mask_pool[:, None, :]
    return {"s": s_out, "x_pool": x_pool, "adj_pool": adj_pool,
            "mask": mask_pool}


# ---------------------------------------------------------------------------
# MaxCut score net (reference: tgp/select/maxcut_select.py:18-130)
# ---------------------------------------------------------------------------


def delta_gcn_dense(g, delta=2.0):
    """P = I − δ·L_sym as a dense matrix (reference: tgp/utils/ops.py
    ``delta_gcn_matrix``)."""
    ei = np.asarray(g[1])
    ew = np.asarray(g[2], np.float64) if len(g) > 2 else np.ones(ei.shape[1])
    n = g[0].shape[0]
    A = np.zeros((n, n))
    np.add.at(A, (ei[0], ei[1]), ew)
    deg = A.sum(1)
    dinv = np.where(deg > 0, 1.0 / np.sqrt(np.where(deg > 0, deg, 1.0)), 0.0)
    A_norm = dinv[:, None] * A * dinv[None, :]
    L = np.eye(n) - A_norm
    return np.eye(n) - delta * L


def maxcut_scores(g, params, delta=2.0, mp_act="tanh", mlp_act="relu",
                  act="tanh"):
    """MaxCutScoreNet forward: Linear → GCNConv(normalize=False) stack over P
    (bias AFTER propagation, PyG GCNConv semantics) → MLP → Linear(1) → tanh.
    ``params``: dict with init_W/init_b, mp=[(W,b),...], mlp=[(W,b),...],
    final_W/final_b."""
    # COO (s, r, w) aggregates messages at the RECEIVER (PyG flow
    # source→target), so the dense-matrix form of one propagation step is
    # out = Pᵀ·h, with P[s, r] = w.
    P = delta_gcn_dense(g, delta).T
    x = np.asarray(g[0], np.float64) @ params["init_W"] + params["init_b"]
    for W, b in params["mp"]:
        x = ACTS[mp_act](P @ (x @ W) + b)
    for W, b in params["mlp"]:
        x = ACTS[mlp_act](x @ W + b)
    score = x @ params["final_W"] + params["final_b"]
    return ACTS[act](score[:, 0])


# ---------------------------------------------------------------------------
# Total-assignment propagation (reference: tgp/utils/ops.py:1222-1441,
# ``propagate_assignments_sparse`` + the deterministic part of
# ``get_assignments``) — exact transcription, NumPy int64
# ---------------------------------------------------------------------------


def propagate_assignments_sparse(assignments, edge_index, kept, mask,
                                 num_clusters):
    """One propagation round, faithful to the reference's sort-key math:
    each unassigned destination adopts the cluster with the most incoming
    edges from assigned senders; ties → smallest cluster index (1-based
    position in ``kept``).  Duplicate edges count as separate votes.
    Returns updated ``(assignments, mask)`` (the mapping rows are implied).
    """
    src, dst = edge_index[0], edge_index[1]
    src_asg = assignments[src]
    valid = (src_asg > 0) & (~mask[dst])
    if valid.sum() == 0:
        return assignments, mask
    vd, va = dst[valid], src_asg[valid]
    combined = vd * (num_clusters + 1) + va
    uniq, counts = np.unique(combined, return_counts=True)
    u_dst = uniq // (num_clusters + 1)
    u_asg = uniq % (num_clusters + 1)
    max_count = counts.max() + 1
    key = (u_dst * (max_count * (num_clusters + 1))
           - counts * (num_clusters + 1) + u_asg)
    order = np.argsort(key, kind="stable")
    s_dst, s_asg = u_dst[order], u_asg[order]
    head = np.concatenate([[True], s_dst[1:] != s_dst[:-1]])
    best_dst, best_asg = s_dst[head], s_asg[head]
    keep = best_asg > 0
    if keep.sum() == 0:
        return assignments, mask
    assignments = assignments.copy()
    mask = mask.copy()
    assignments[best_dst[keep]] = best_asg[keep]
    mask[best_dst[keep]] = True
    return assignments, mask


def get_assignments_deterministic(kept_node_indices, edge_index, num_nodes,
                                  max_iter=5):
    """``get_assignments`` without the random fallback: returns the
    1-based assignment vector after ≤ ``max_iter`` propagation rounds
    (0 = still unassigned) plus the assigned mask — the deterministic
    prefix every implementation must match exactly."""
    kept = np.asarray(kept_node_indices, np.int64)
    mask = np.zeros(num_nodes, bool)
    mask[kept] = True
    assignments = np.zeros(num_nodes, np.int64)
    assignments[kept] = np.arange(1, kept.size + 1)
    for _ in range(max_iter):
        if mask.all():
            break
        assignments, mask = propagate_assignments_sparse(
            assignments, np.asarray(edge_index, np.int64), kept, mask,
            kept.size)
    return assignments, mask


# ---------------------------------------------------------------------------
# Graclus randomized greedy matching (reference: tgp/select/graclus_select.py
# :67-69 delegates to torch_cluster.graclus_cluster — CPU kernel semantics:
# visit vertices in a random permutation; an unmatched vertex pairs with its
# unmatched neighbor of maximal edge weight) — NumPy transcription
# ---------------------------------------------------------------------------


def graclus_matching_randomized(edge_index, num_nodes, edge_weight=None,
                                rng=None):
    """One run of the reference's randomized greedy matching.  Returns the
    per-node cluster id (min of the pair's node ids, singletons map to
    themselves) — the quantity bounded by tests/test_ref_parity_graclus.py
    is the total matched edge weight, not the ids."""
    rng = np.random.default_rng(rng)
    src = np.asarray(edge_index[0], np.int64)
    dst = np.asarray(edge_index[1], np.int64)
    w = (np.ones(src.size) if edge_weight is None
         else np.asarray(edge_weight, np.float64))
    adj = [[] for _ in range(num_nodes)]
    for s, d, ww in zip(src, dst, w):
        if s != d:
            adj[s].append((int(d), float(ww)))
    cluster = np.arange(num_nodes, dtype=np.int64)
    matched = np.zeros(num_nodes, bool)
    for u in rng.permutation(num_nodes):
        if matched[u]:
            continue
        best, best_w = -1, -np.inf
        for v, ww in adj[u]:
            if not matched[v] and v != u and ww > best_w:
                best, best_w = v, ww
        matched[u] = True
        if best >= 0:
            matched[best] = True
            c = min(u, best)
            cluster[u] = c
            cluster[best] = c
    return cluster


def matching_weight(cluster, edge_index, edge_weight=None):
    """Total weight of edges whose endpoints share a (non-singleton)
    cluster, each undirected pair counted once."""
    src = np.asarray(edge_index[0], np.int64)
    dst = np.asarray(edge_index[1], np.int64)
    w = (np.ones(src.size) if edge_weight is None
         else np.asarray(edge_weight, np.float64))
    sel = (cluster[src] == cluster[dst]) & (src < dst)
    return float(w[sel].sum())
