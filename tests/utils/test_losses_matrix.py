"""Loss-library behavioral matrix (reference: tests/utils/test_losses.py,
1947 LoC): twin equality per loss across batch reductions and three graph
regimes (weighted, isolated nodes + an edgeless graph, heavy zero-padding
with very unequal sizes), gradient flow with a padded-row-zero invariant,
jit consistency, and analytic edge-case oracles."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tgp_tpu.losses as L
from tgp_tpu.graph import from_graphs, to_dense

K = 4


def _mk(sizes, edge_lists, seed, pad_nodes, pad_edges):
    """Batch from explicit edge lists (None → ER(p=.5)); weighted."""
    rng = np.random.default_rng(seed)
    graphs = []
    for g, n in enumerate(sizes):
        x = rng.normal(size=(n, 4)).astype(np.float32)
        if edge_lists[g] is None:
            upper = np.triu(rng.random((n, n)) < 0.5, k=1)
            adj = upper | upper.T
            s, r = np.nonzero(adj)
            ei = np.stack([s, r]).astype(np.int64)
        else:
            ei = np.asarray(edge_lists[g], np.int64).reshape(2, -1)
        ew = rng.uniform(0.5, 2.0, size=ei.shape[1]).astype(np.float32)
        # symmetric weights (undirected edge pairs share a weight)
        key = ei.min(0) * 10_000 + ei.max(0)
        _, inv = np.unique(key, return_inverse=True)
        base_w = rng.uniform(0.5, 2.0, size=inv.max() + 1 if inv.size else 0)
        ew = base_w[inv].astype(np.float32) if inv.size else ew
        graphs.append((x, ei, ew))
    return from_graphs(graphs, pad_nodes=pad_nodes, pad_edges=pad_edges)


def _chain(n):
    s = np.arange(n - 1)
    return np.concatenate([np.stack([s, s + 1], 0),
                           np.stack([s + 1, s], 0)], 1)


def _prep(batch, seed=5):
    d = to_dense(batch)
    rng = np.random.default_rng(seed)
    logits = rng.normal(size=(batch.num_nodes, K)).astype(np.float32)
    S_flat = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    S_flat = S_flat * np.asarray(batch.node_mask)[:, None]
    S_dense = np.zeros((batch.num_graphs, batch.max_nodes, K), np.float32)
    ng, pos, nm = (np.asarray(batch.node_graph), np.asarray(batch.node_pos),
                   np.asarray(batch.node_mask))
    for i in range(batch.num_nodes):
        if nm[i]:
            S_dense[ng[i], pos[i]] = S_flat[i]
    return batch, d, jnp.asarray(S_flat), jnp.asarray(S_dense)


@pytest.fixture(scope="module")
def fixtures():
    return {
        # mixed sizes, weighted ER graphs
        "base": _prep(_mk([9, 6, 12], [None, None, None], 3,
                          pad_nodes=32, pad_edges=192)),
        # graph 0: chain over 6 of 8 nodes (2 isolated); graph 1: fully
        # edgeless; graph 2: ER
        "isolated": _prep(_mk([8, 5, 10],
                              [_chain(6), np.zeros((2, 0)), None], 7,
                              pad_nodes=40, pad_edges=128)),
        # heavy padding, very unequal sizes
        "padded": _prep(_mk([3, 17], [None, None], 9,
                            pad_nodes=64, pad_edges=256)),
    }


def _pooled(d, S):
    return jnp.einsum("bnk,bnm,bmj->bkj", S, d.adj, S)


# name → (batched(d, Sd, red), sparse(b, Sf, red), tol)
SPECS = {
    "mincut": (
        lambda b, d, Sf, Sd, red: L.mincut_loss(
            d.adj, Sd, _pooled(d, Sd), batch_reduction=red),
        lambda b, d, Sf, Sd, red: L.sparse_mincut_loss(
            b.senders, b.receivers, b.edge_weight, Sf, b.node_graph,
            b.num_graphs, b.node_mask, batch_reduction=red),
        1e-3),
    "ho_mincut": (
        lambda b, d, Sf, Sd, red: L.mincut_loss(
            (a3 := jnp.einsum("bij,bjk,bkl->bil", d.adj, d.adj, d.adj)),
            Sd, jnp.einsum("bnk,bnm,bmj->bkj", Sd, a3, Sd),
            batch_reduction=red),
        lambda b, d, Sf, Sd, red: L.sparse_ho_mincut_loss(
            b.senders, b.receivers, b.edge_weight, Sf, b.node_graph,
            b.num_graphs, b.node_mask, batch_reduction=red),
        2e-3),
    "ortho": (
        lambda b, d, Sf, Sd, red: L.orthogonality_loss(
            Sd, batch_reduction=red),
        lambda b, d, Sf, Sd, red: L.unbatched_orthogonality_loss(
            Sf, b.node_graph, b.num_graphs, b.node_mask,
            batch_reduction=red),
        1e-3),
    "hosc_ortho": (
        lambda b, d, Sf, Sd, red: L.hosc_orthogonality_loss(
            Sd, mask=d.mask, batch_reduction=red),
        lambda b, d, Sf, Sd, red: L.unbatched_hosc_orthogonality_loss(
            Sf, b.node_graph, b.num_graphs, b.node_mask,
            batch_reduction=red),
        1e-3),
    "link_pred": (
        lambda b, d, Sf, Sd, red: L.link_pred_loss(
            Sd, d.adj, normalize_loss=False, mask=d.mask),
        lambda b, d, Sf, Sd, red: L.sparse_link_pred_loss(
            Sf, b.senders, b.receivers, b.edge_weight, b.node_graph,
            b.num_graphs, b.node_mask, normalize_loss=False),
        2e-3),
    "entropy": (
        lambda b, d, Sf, Sd, red: L.entropy_loss(Sd, mask=d.mask),
        lambda b, d, Sf, Sd, red: L.unbatched_entropy_loss(
            Sf, node_mask=b.node_mask),
        1e-3),
    "totvar": (
        lambda b, d, Sf, Sd, red: L.totvar_loss(
            Sd, d.adj, batch_reduction=red),
        lambda b, d, Sf, Sd, red: L.sparse_totvar_loss(
            b.senders, b.receivers, b.edge_weight, Sf, b.node_graph,
            b.num_graphs, batch_reduction=red),
        2e-3),
    "asym_norm": (
        lambda b, d, Sf, Sd, red: L.asym_norm_loss(
            Sd, K, mask=d.mask, batch_reduction=red),
        lambda b, d, Sf, Sd, red: L.unbatched_asym_norm_loss(
            Sf, K, b.node_graph, b.num_graphs, b.node_mask,
            batch_reduction=red),
        2e-3),
    "just_balance": (
        lambda b, d, Sf, Sd, red: L.just_balance_loss(
            Sd, mask=d.mask, batch_reduction=red),
        lambda b, d, Sf, Sd, red: L.unbatched_just_balance_loss(
            Sf, b.node_graph, b.num_graphs, b.node_mask,
            batch_reduction=red),
        1e-3),
    "spectral": (
        lambda b, d, Sf, Sd, red: L.spectral_loss(
            d.adj, Sd, _pooled(d, Sd), mask=d.mask, batch_reduction=red),
        lambda b, d, Sf, Sd, red: L.sparse_spectral_loss(
            b.senders, b.receivers, b.edge_weight, Sf, b.node_graph,
            b.num_graphs, b.node_mask, batch_reduction=red),
        2e-3),
    "cluster": (
        lambda b, d, Sf, Sd, red: L.cluster_loss(
            Sd, mask=d.mask, batch_reduction=red),
        lambda b, d, Sf, Sd, red: L.unbatched_cluster_loss(
            Sf, b.node_graph, b.num_graphs, b.node_mask,
            batch_reduction=red),
        1e-3),
}

# losses whose batched form takes no batch_reduction (global by definition)
NO_REDUCTION = {"link_pred", "entropy"}


@pytest.mark.parametrize("fixture", ["base", "isolated", "padded"])
@pytest.mark.parametrize("red", ["mean", "sum"])
@pytest.mark.parametrize("name", sorted(SPECS))
def test_twin_equality(fixtures, name, red, fixture):
    if name in NO_REDUCTION and red == "sum":
        pytest.skip("global loss: no batch reduction")
    b, d, Sf, Sd = fixtures[fixture]
    batched_fn, sparse_fn, tol = SPECS[name]
    batched = float(batched_fn(b, d, Sf, Sd, red))
    sparse = float(sparse_fn(b, d, Sf, Sd, red))
    assert math.isfinite(batched), name
    np.testing.assert_allclose(batched, sparse, rtol=tol, atol=tol)


@pytest.mark.parametrize("name", sorted(SPECS))
def test_gradient_flow_and_padding(fixtures, name):
    """d(sparse loss)/dS is finite, carries signal on valid rows, and is
    exactly zero on padded rows (the masking invariant of the static-shape
    design — a finite fill leaking into the loss would show up here)."""
    b, d, Sf, Sd = fixtures["isolated"]
    _, sparse_fn, _ = SPECS[name]
    g = jax.grad(lambda S: sparse_fn(b, d, S, Sd, "mean"))(Sf)
    g = np.asarray(g)
    nm = np.asarray(b.node_mask)
    assert np.isfinite(g).all(), name
    assert np.abs(g[nm]).sum() > 0, name
    np.testing.assert_array_equal(g[~nm], 0.0)


@pytest.mark.parametrize("name", sorted(SPECS))
def test_batched_gradient_finite(fixtures, name):
    b, d, Sf, Sd = fixtures["isolated"]
    batched_fn, _, _ = SPECS[name]
    g = jax.grad(lambda S: jnp.asarray(
        batched_fn(b, d, Sf, S, "mean"), jnp.float32))(Sd)
    assert np.isfinite(np.asarray(g)).all(), name


@pytest.mark.parametrize("name", sorted(SPECS))
def test_jit_consistency(fixtures, name):
    b, d, Sf, Sd = fixtures["base"]
    _, sparse_fn, _ = SPECS[name]
    eager = float(sparse_fn(b, d, Sf, Sd, "mean"))
    jitted = float(jax.jit(
        lambda S: sparse_fn(b, d, S, Sd, "mean"))(Sf))
    np.testing.assert_allclose(jitted, eager, rtol=1e-5, atol=1e-6)


def test_invalid_reduction_raises(fixtures):
    b, d, Sf, Sd = fixtures["base"]
    with pytest.raises(ValueError, match="batch_reduction"):
        L.mincut_loss(d.adj, Sd, _pooled(d, Sd), batch_reduction="max")


# ---------------------------------------------------------------------------
# analytic edge cases (reference: test_losses.py *_edge_cases /
# *_basic oracles)
# ---------------------------------------------------------------------------


def test_hosc_ortho_k1_returns_zero(fixtures):
    b, d, Sf, Sd = fixtures["base"]
    assert float(L.hosc_orthogonality_loss(Sd[..., :1])) == 0.0
    assert float(L.unbatched_hosc_orthogonality_loss(
        Sf[:, :1], b.node_graph, b.num_graphs, b.node_mask)) == 0.0


def test_asym_norm_k1_returns_zero(fixtures):
    b, d, Sf, Sd = fixtures["base"]
    assert float(L.asym_norm_loss(Sd[..., :1], 1, mask=d.mask)) == 0.0


def test_entropy_onehot_vs_uniform(fixtures):
    b, d, Sf, Sd = fixtures["base"]
    nm = b.node_mask
    onehot = jnp.eye(K)[jnp.zeros(b.num_nodes, jnp.int32)] * nm[:, None]
    uniform = jnp.full((b.num_nodes, K), 1.0 / K) * nm[:, None]
    e1 = float(L.unbatched_entropy_loss(onehot, node_mask=nm))
    e2 = float(L.unbatched_entropy_loss(uniform, node_mask=nm))
    assert e1 == pytest.approx(0.0, abs=1e-5)
    assert e2 == pytest.approx(math.log(K), rel=1e-4)
    assert e1 < e2  # entropy regularizer prefers confident assignments


def test_cluster_loss_analytic():
    """Uniform S → √K/n·‖colsum‖−1 = 0; all-one-cluster → √K−1."""
    n = 10
    uniform = jnp.full((1, n, K), 1.0 / K)
    collapsed = jnp.zeros((1, n, K)).at[:, :, 0].set(1.0)
    assert float(L.cluster_loss(uniform)) == pytest.approx(0.0, abs=1e-5)
    assert float(L.cluster_loss(collapsed)) == pytest.approx(
        math.sqrt(K) - 1.0, rel=1e-5)


def test_mincut_analytic_two_cliques():
    """Perfect 2-clustering of two disjoint cliques: cut loss −1 (all edge
    mass intra-cluster), ortho loss 0 (balanced hard S)."""
    n = 8
    adj = np.zeros((1, n, n), np.float32)
    adj[0, :4, :4] = 1 - np.eye(4)
    adj[0, 4:, 4:] = 1 - np.eye(4)
    S = np.zeros((1, n, 2), np.float32)
    S[0, :4, 0] = 1
    S[0, 4:, 1] = 1
    adj, S = jnp.asarray(adj), jnp.asarray(S)
    pooled = jnp.einsum("bnk,bnm,bmj->bkj", S, adj, S)
    assert float(L.mincut_loss(adj, S, pooled)) == pytest.approx(-1.0, rel=1e-5)
    assert float(L.orthogonality_loss(S)) == pytest.approx(0.0, abs=1e-5)


def test_spectral_analytic_two_cliques():
    """Perfect 2-clustering of two disjoint cliques maximizes modularity:
    loss = −(1 − Σ(d_c/2m)²) = −0.5 for equal halves."""
    n = 8
    adj = np.zeros((1, n, n), np.float32)
    adj[0, :4, :4] = 1 - np.eye(4)
    adj[0, 4:, 4:] = 1 - np.eye(4)
    S = np.zeros((1, n, 2), np.float32)
    S[0, :4, 0] = 1
    S[0, 4:, 1] = 1
    adj, S = jnp.asarray(adj), jnp.asarray(S)
    pooled = jnp.einsum("bnk,bnm,bmj->bkj", S, adj, S)
    assert float(L.spectral_loss(adj, S, pooled)) == pytest.approx(
        -0.5, rel=1e-5)


def test_totvar_analytic():
    """Hard S over a single edge crossing clusters: |S_u − S_v|₁ = 2, one
    undirected edge → loss = 2·(w_uv+w_vu)/(2·2) = w."""
    adj = np.zeros((1, 2, 2), np.float32)
    adj[0, 0, 1] = adj[0, 1, 0] = 1.5
    S = jnp.asarray([[[1.0, 0.0], [0.0, 1.0]]])
    got = float(L.totvar_loss(S, jnp.asarray(adj)))
    assert got == pytest.approx(1.5, rel=1e-5)


def test_link_pred_normalization_semantics(fixtures):
    """With a mask, BOTH twins normalize by the valid-entry count Σ n_g²
    (padding-invariant; the reference's dense loss divides by adj.numel()
    including padding, losses.py:676-679, inconsistent with its own sparse
    twin :771-777 — see link_pred_loss docstring).  Without a mask the
    batched loss keeps the reference's adj.size normalizer."""
    b, d, Sf, Sd = fixtures["base"]
    raw = float(L.link_pred_loss(Sd, d.adj, normalize_loss=False,
                                 mask=d.mask))
    batched = float(L.link_pred_loss(Sd, d.adj, normalize_loss=True,
                                     mask=d.mask))
    sparse = float(L.sparse_link_pred_loss(
        Sf, b.senders, b.receivers, b.edge_weight, b.node_graph,
        b.num_graphs, b.node_mask, normalize_loss=True))
    n_g = np.bincount(np.asarray(b.node_graph)[np.asarray(b.node_mask)],
                      minlength=b.num_graphs).astype(np.float64)
    assert batched == pytest.approx(raw / (n_g ** 2).sum(), rel=1e-5)
    assert sparse == pytest.approx(batched, rel=2e-3)
    # maskless batched path: reference adj.numel() semantics
    nomask = float(L.link_pred_loss(Sd, d.adj, normalize_loss=True))
    raw_nomask = float(L.link_pred_loss(Sd, d.adj, normalize_loss=False))
    assert nomask == pytest.approx(raw_nomask / d.adj.size, rel=1e-5)


def test_just_balance_unnormalized(fixtures):
    b, d, Sf, Sd = fixtures["base"]
    batched = float(L.just_balance_loss(Sd, mask=d.mask,
                                        normalize_loss=False))
    sparse = float(L.unbatched_just_balance_loss(
        Sf, b.node_graph, b.num_graphs, b.node_mask,
        normalize_loss=False))
    np.testing.assert_allclose(batched, sparse, rtol=1e-4, atol=1e-4)


def test_kl_loss_mask_vs_node_graph(fixtures):
    """kl_loss accepts a dense mask XOR (node_graph, num_graphs)
    (reference losses.py:1359-1443); both views of the same per-node KL
    agree."""
    b, d, Sf, Sd = fixtures["base"]
    rng = np.random.default_rng(13)
    kl_flat = jnp.asarray(
        rng.uniform(0, 1, size=b.num_nodes).astype(np.float32)
        * np.asarray(b.node_mask))
    kl_dense = np.zeros((b.num_graphs, b.max_nodes), np.float32)
    ng, pos, nm = (np.asarray(b.node_graph), np.asarray(b.node_pos),
                   np.asarray(b.node_mask))
    for i in range(b.num_nodes):
        if nm[i]:
            kl_dense[ng[i], pos[i]] = kl_flat[i]
    a = float(L.kl_loss(jnp.asarray(kl_dense), mask=d.mask))
    c = float(L.kl_loss(kl_flat, node_graph=b.node_graph,
                        num_graphs=b.num_graphs))
    np.testing.assert_allclose(a, c, rtol=1e-5)


def test_maxcut_loss_bipartite_optimum():
    """On one bipartite edge with z = ±1, maxcut loss reaches its minimum
    −1 (all edges cut)."""
    z = jnp.asarray([1.0, -1.0])
    s = jnp.asarray([0, 1]); r = jnp.asarray([1, 0])
    w = jnp.asarray([1.0, 1.0])
    ng = jnp.zeros(2, jnp.int32)
    got = float(L.maxcut_loss(z, s, r, w, ng, 1))
    assert got == pytest.approx(-1.0, rel=1e-5)
