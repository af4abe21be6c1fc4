"""Loss library tests: batched-vs-sparse twin equality on padded batches
(the reference's key oracle, tests/utils/test_losses.py +
tests/poolers/test_dense_poolers_batched_vs_unbatched.py:39-171)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tgp_tpu.losses as L
from tgp_tpu.graph import to_dense
from tests.utils_graphs import make_batch

RTOL = ATOL = 2e-4


@pytest.fixture(scope="module")
def setup():
    b = make_batch([9, 6, 12], num_features=4, seed=11, weighted=True,
                   pad_nodes=32, pad_edges=160)
    d = to_dense(b)
    rng = np.random.default_rng(5)
    K = 4
    # soft assignment: rows softmax, zero on padding
    logits = rng.normal(size=(b.num_nodes, K)).astype(np.float32)
    S_flat = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    S_flat = S_flat * np.asarray(b.node_mask)[:, None]
    S_flat = jnp.asarray(S_flat)
    # batched dense version of the same S
    S_dense = np.zeros((b.num_graphs, b.max_nodes, K), np.float32)
    ng, pos, nm = (np.asarray(b.node_graph), np.asarray(b.node_pos),
                   np.asarray(b.node_mask))
    for i in range(b.num_nodes):
        if nm[i]:
            S_dense[ng[i], pos[i]] = np.asarray(S_flat)[i]
    return b, d, S_flat, jnp.asarray(S_dense), K


def _dense_pooled(d, S):
    return jnp.einsum("bnk,bnm,bmj->bkj", S, d.adj, S)


def test_mincut_twins(setup):
    b, d, S_flat, S_dense, K = setup
    batched = L.mincut_loss(d.adj, S_dense, _dense_pooled(d, S_dense))
    sparse = L.sparse_mincut_loss(
        b.senders, b.receivers, b.edge_weight, S_flat, b.node_graph,
        b.num_graphs, b.node_mask)
    np.testing.assert_allclose(float(batched), float(sparse), rtol=RTOL, atol=ATOL)


def test_ortho_twins(setup):
    b, d, S_flat, S_dense, K = setup
    batched = L.orthogonality_loss(S_dense)
    sparse = L.unbatched_orthogonality_loss(S_flat, b.node_graph, b.num_graphs,
                                            b.node_mask)
    np.testing.assert_allclose(float(batched), float(sparse), rtol=RTOL, atol=ATOL)


def test_hosc_ortho_twins(setup):
    b, d, S_flat, S_dense, K = setup
    batched = L.hosc_orthogonality_loss(S_dense, mask=d.mask)
    sparse = L.unbatched_hosc_orthogonality_loss(
        S_flat, b.node_graph, b.num_graphs, b.node_mask)
    np.testing.assert_allclose(float(batched), float(sparse), rtol=RTOL, atol=ATOL)


def test_link_pred_twins(setup):
    b, d, S_flat, S_dense, K = setup
    # normalize=False to avoid the adj.size vs sum-n_g^2 padding mismatch
    batched = L.link_pred_loss(S_dense, d.adj, normalize_loss=False, mask=d.mask)
    sparse = L.sparse_link_pred_loss(
        S_flat, b.senders, b.receivers, b.edge_weight, b.node_graph,
        b.num_graphs, b.node_mask, normalize_loss=False)
    np.testing.assert_allclose(float(batched), float(sparse), rtol=1e-3, atol=1e-3)


def test_entropy_twins(setup):
    b, d, S_flat, S_dense, K = setup
    n_valid = int(np.asarray(b.node_mask).sum())
    batched = L.entropy_loss(S_dense, mask=d.mask)
    sparse = L.unbatched_entropy_loss(S_flat, node_mask=b.node_mask)
    np.testing.assert_allclose(float(batched), float(sparse), rtol=RTOL, atol=ATOL)
    # oracle
    S = np.asarray(S_flat)
    nm = np.asarray(b.node_mask)
    ent = -(S[nm] * np.log(S[nm] + 1e-8)).sum(-1)
    np.testing.assert_allclose(float(sparse), ent.sum() / n_valid,
                               rtol=RTOL, atol=ATOL)


def test_totvar_twins(setup):
    b, d, S_flat, S_dense, K = setup
    batched = L.totvar_loss(S_dense, d.adj)
    sparse = L.sparse_totvar_loss(
        b.senders, b.receivers, b.edge_weight, S_flat, b.node_graph,
        b.num_graphs)
    np.testing.assert_allclose(float(batched), float(sparse), rtol=1e-3, atol=1e-3)


def test_asym_norm_twins(setup):
    b, d, S_flat, S_dense, K = setup
    batched = L.asym_norm_loss(S_dense, K, mask=d.mask)
    sparse = L.unbatched_asym_norm_loss(S_flat, K, b.node_graph, b.num_graphs,
                                        b.node_mask)
    np.testing.assert_allclose(float(batched), float(sparse), rtol=1e-3, atol=1e-3)


def test_just_balance_twins(setup):
    b, d, S_flat, S_dense, K = setup
    batched = L.just_balance_loss(S_dense, mask=d.mask)
    sparse = L.unbatched_just_balance_loss(S_flat, b.node_graph, b.num_graphs,
                                           b.node_mask)
    np.testing.assert_allclose(float(batched), float(sparse), rtol=RTOL, atol=ATOL)


def test_spectral_twins(setup):
    b, d, S_flat, S_dense, K = setup
    batched = L.spectral_loss(d.adj, S_dense, _dense_pooled(d, S_dense), mask=d.mask)
    sparse = L.sparse_spectral_loss(
        b.senders, b.receivers, b.edge_weight, S_flat, b.node_graph,
        b.num_graphs, b.node_mask)
    np.testing.assert_allclose(float(batched), float(sparse), rtol=1e-3, atol=1e-3)


def test_cluster_twins(setup):
    b, d, S_flat, S_dense, K = setup
    batched = L.cluster_loss(S_dense, mask=d.mask)
    sparse = L.unbatched_cluster_loss(S_flat, b.node_graph, b.num_graphs,
                                      b.node_mask)
    np.testing.assert_allclose(float(batched), float(sparse), rtol=RTOL, atol=ATOL)


def test_ho_mincut_vs_dense_motif(setup):
    """sparse_ho_mincut equals dense mincut on the motif adjacency A³."""
    b, d, S_flat, S_dense, K = setup
    adj3 = jnp.einsum("bij,bjk,bkl->bil", d.adj, d.adj, d.adj)
    pooled3 = jnp.einsum("bnk,bnm,bmj->bkj", S_dense, adj3, S_dense)
    dense = L.mincut_loss(adj3, S_dense, pooled3)
    sparse = L.sparse_ho_mincut_loss(
        b.senders, b.receivers, b.edge_weight, S_flat, b.node_graph,
        b.num_graphs, b.node_mask)
    np.testing.assert_allclose(float(dense), float(sparse), rtol=1e-3, atol=1e-3)


def test_maxcut_loss_oracle(setup):
    b, d, S_flat, S_dense, K = setup
    rng = np.random.default_rng(3)
    z = jnp.asarray(np.tanh(rng.normal(size=b.num_nodes)).astype(np.float32)
                    * np.asarray(b.node_mask))
    got = L.maxcut_loss(z, b.senders, b.receivers, b.edge_weight,
                        b.node_graph, b.num_graphs)
    # oracle
    zn = np.asarray(z)
    s, r = np.asarray(b.senders), np.asarray(b.receivers)
    w = np.asarray(b.edge_weight)
    ng = np.asarray(b.node_graph)
    per = np.zeros(b.num_graphs)
    vol = np.zeros(b.num_graphs)
    for e in range(len(s)):
        if w[e] != 0:
            per[ng[s[e]]] += w[e] * zn[s[e]] * zn[r[e]]
            vol[ng[s[e]]] += w[e]
    expect = np.mean(per / np.where(vol == 0, 1, vol))
    np.testing.assert_allclose(float(got), expect, rtol=1e-4, atol=1e-4)


def test_beta_kl():
    from scipy import stats  # scipy present? fall back to closed form check
    a_q, b_q, a_p, b_p = 2.0, 3.0, 1.0, 1.0
    got = float(L.beta_kl_divergence(jnp.asarray(a_q), jnp.asarray(b_q),
                                     jnp.asarray(a_p), jnp.asarray(b_p)))
    # KL(Beta(2,3) || Beta(1,1)) = -H(Beta(2,3)) since Beta(1,1) is uniform
    import math as m
    from scipy.special import betaln, digamma
    expect = (betaln(a_p, b_p) - betaln(a_q, b_q)
              + (a_q - a_p) * digamma(a_q) + (b_q - b_p) * digamma(b_q)
              + (a_p - a_q + b_p - b_q) * digamma(a_q + b_q))
    np.testing.assert_allclose(got, expect, rtol=1e-5)


def test_bce_reconstruction(setup):
    b, d, S_flat, S_dense, K = setup
    rng = np.random.default_rng(7)
    rec = jnp.asarray(rng.normal(size=d.adj.shape).astype(np.float32))
    adj01 = (d.adj != 0).astype(jnp.float32)
    loss = L.weighted_bce_reconstruction_loss(rec, adj01, mask=d.mask)
    assert np.isfinite(float(loss))
    # unbalanced, no mask reduces to mean-free sum of BCE
    loss2 = L.weighted_bce_reconstruction_loss(
        rec, adj01, mask=None, balance_links=False)
    import scipy.special as sp
    r = np.asarray(rec)
    a = np.asarray(adj01)
    bce = np.maximum(r, 0) - r * a + np.log1p(np.exp(-np.abs(r)))
    np.testing.assert_allclose(float(loss2), bce.sum((1, 2)).mean(),
                               rtol=1e-4, atol=1e-4)
