"""Loss edge cases and closed-form oracles (reference behavioral coverage:
tests/utils/test_losses.py — reduction modes, degenerate graphs, and
known-value configurations; formulas from tgp/utils/losses.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tgp_tpu import losses as L


def _clique_batch(B=2, n=6, k=2):
    """Two disconnected k-cliques per graph + the perfect one-hot S."""
    per = n // k
    adj = np.zeros((B, n, n), np.float32)
    S = np.zeros((B, n, k), np.float32)
    for c in range(k):
        lo, hi = c * per, (c + 1) * per
        adj[:, lo:hi, lo:hi] = 1.0
        S[:, lo:hi, c] = 1.0
    for i in range(n):
        adj[:, i, i] = 0.0
    return jnp.asarray(adj), jnp.asarray(S)


# ----------------------------------------------------- reduction semantics
@pytest.mark.parametrize("fn,args", [
    ("mincut_loss", "mincut"),
    ("orthogonality_loss", "S_only"),
    ("totvar_loss", "S_adj"),
    ("just_balance_loss", "S_only"),
])
def test_sum_is_mean_times_batch(fn, args):
    adj, S = _clique_batch(B=3)
    S = S + 0.1  # break the perfect structure for non-zero losses
    adj_pooled = jnp.einsum("bnk,bnm,bml->bkl", S, adj, S)
    f = getattr(L, fn)
    if args == "mincut":
        a = (adj, S, adj_pooled)
    elif args == "S_adj":
        a = (S, adj)
    else:
        a = (S,)
    mean = float(f(*a, batch_reduction="mean"))
    total = float(f(*a, batch_reduction="sum"))
    np.testing.assert_allclose(total, mean * 3, rtol=1e-5)


def test_invalid_reduction_raises():
    adj, S = _clique_batch()
    with pytest.raises(ValueError, match="batch_reduction"):
        L.orthogonality_loss(S, batch_reduction="prod")


# ------------------------------------------------------ closed-form values
def test_mincut_perfect_partition_is_minus_one():
    """Perfect clustering of disconnected cliques: cut term = −1
    (reference losses.py:39-84: −Tr(SᵀAS)/Tr(SᵀDS))."""
    adj, S = _clique_batch()
    adj_pooled = jnp.einsum("bnk,bnm,bml->bkl", S, adj, S)
    val = float(L.mincut_loss(adj, S, adj_pooled))
    np.testing.assert_allclose(val, -1.0, atol=1e-5)


def test_orthogonality_zero_at_balanced_onehot():
    """Balanced one-hot S has SᵀS ∝ I → ortho loss 0
    (losses.py:87-123)."""
    _, S = _clique_batch()
    np.testing.assert_allclose(float(L.orthogonality_loss(S)), 0.0,
                               atol=1e-6)


def test_entropy_zero_at_onehot_max_at_uniform():
    _, S = _clique_batch()
    z = float(L.entropy_loss(S))
    u = float(L.entropy_loss(jnp.full_like(S, 0.5)))
    np.testing.assert_allclose(z, 0.0, atol=1e-6)
    np.testing.assert_allclose(u, np.log(2.0), rtol=1e-5)


def test_totvar_zero_on_components():
    """S constant on connected components → total variation 0
    (losses.py totvar: Σ w_ij |S_i − S_j|)."""
    adj, S = _clique_batch()
    np.testing.assert_allclose(float(L.totvar_loss(S, adj)), 0.0, atol=1e-6)
    # mixing the components must cost something
    S_bad = jnp.roll(S, 1, axis=1)
    assert float(L.totvar_loss(S_bad, adj)) > 0.01


def test_link_pred_perfect_reconstruction():
    adj, S = _clique_batch()
    # SSᵀ equals the block structure (up to the diagonal); compare against
    # a shuffled S which must be strictly worse
    good = float(L.link_pred_loss(S, adj))
    bad = float(L.link_pred_loss(jnp.roll(S, 2, axis=1), adj))
    assert good < bad


def test_just_balance_prefers_balanced():
    _, S = _clique_batch()
    bal = float(L.just_balance_loss(S))
    lop = jnp.concatenate([jnp.ones_like(S[..., :1]),
                           jnp.zeros_like(S[..., 1:])], -1)
    lopsided = float(L.just_balance_loss(lop))
    assert bal < lopsided


def test_spectral_loss_finite_on_empty_adj():
    adj, S = _clique_batch()
    zero = jnp.zeros_like(adj)
    val = float(L.spectral_loss(zero, S, jnp.zeros((2, 2, 2))))
    assert np.isfinite(val)


# ------------------------------------------------------- degenerate inputs
def test_losses_finite_on_single_node_graphs():
    """1-node graphs with no edges must not NaN any dense loss."""
    adj = jnp.zeros((2, 1, 1))
    S = jnp.ones((2, 1, 2)) * 0.5
    adj_pooled = jnp.einsum("bnk,bnm,bml->bkl", S, adj, S)
    for fn, a in [
        (L.mincut_loss, (adj, S, adj_pooled)),
        (L.orthogonality_loss, (S,)),
        (L.hosc_orthogonality_loss, (S,)),
        (L.entropy_loss, (S,)),
        (L.totvar_loss, (S, adj)),
        (L.just_balance_loss, (S,)),
        (L.spectral_loss, (adj, S, adj_pooled)),
        (L.cluster_loss, (S,)),
        (L.link_pred_loss, (S, adj)),
    ]:
        assert np.isfinite(float(fn(*a))), fn.__name__


def test_sparse_losses_finite_on_edgeless_graph():
    """Sparse twins on a fully masked edge set stay finite."""
    N, E, B, K = 6, 4, 2, 3
    senders = jnp.zeros(E, jnp.int32)
    receivers = jnp.zeros(E, jnp.int32)
    ew = jnp.zeros(E)
    S = jnp.full((N, K), 1.0 / K)
    ng = jnp.asarray([0, 0, 0, 1, 1, 1], jnp.int32)
    nm = jnp.ones(N, bool)
    em = jnp.zeros(E, bool)
    for fn, kw in ((L.sparse_mincut_loss, {"node_mask": nm}),
                   (L.sparse_totvar_loss, {}),
                   (L.sparse_spectral_loss, {"node_mask": nm})):
        val = float(fn(senders, receivers, jnp.where(em, ew, 0.0), S, ng, B,
                       **kw))
        assert np.isfinite(val), fn.__name__


def test_kl_loss_zero_for_identical_beta():
    kl = L.beta_kl_divergence(jnp.ones(4) * 2, jnp.ones(4) * 3,
                              jnp.ones(4) * 2, jnp.ones(4) * 3)
    np.testing.assert_allclose(np.asarray(kl), 0.0, atol=1e-6)


def test_weighted_bce_balance_flags():
    adj, S = _clique_batch()
    rec = jnp.einsum("bnk,bmk->bnm", S, S) * 4 - 2  # logits
    a = float(L.weighted_bce_reconstruction_loss(rec, adj,
                                                 balance_links=True))
    b = float(L.weighted_bce_reconstruction_loss(rec, adj,
                                                 balance_links=False))
    assert np.isfinite(a) and np.isfinite(b) and a != b


# -------------------------------------------- [E,1] column edge weights
# Reference contract: every edge_weight entry point accepts [E] and [E,1]
# (tgp/utils/ops.py:1043-1058 check_and_filter_edge_weights); other shapes
# raise.  Exercised across the sparse twins and spmm.
class TestColumnEdgeWeights:
    def _coo(self, seed=0, N=8, E=12, K=3):
        rng = np.random.default_rng(seed)
        s = jnp.asarray(rng.integers(0, N, E), jnp.int32)
        r = jnp.asarray(rng.integers(0, N, E), jnp.int32)
        w = jnp.asarray(rng.uniform(0.5, 1.5, E), jnp.float32)
        S = jnp.asarray(rng.dirichlet(np.ones(K), N), jnp.float32)
        ng = jnp.zeros(N, jnp.int32)
        return s, r, w, S, ng

    @pytest.mark.parametrize("name,order", [
        ("sparse_mincut_loss", "wS"),
        ("sparse_ho_mincut_loss", "wS"),
        ("sparse_totvar_loss", "wS"),
        ("sparse_spectral_loss", "wS"),
        ("sparse_link_pred_loss", "Sw"),
    ])
    def test_col_weight_equals_flat(self, name, order):
        s, r, w, S, ng = self._coo()
        fn = getattr(L, name)
        if order == "wS":
            flat = fn(s, r, w, S, ng, 1)
            col = fn(s, r, w[:, None], S, ng, 1)
        else:
            flat = fn(S, s, r, w, ng, 1)
            col = fn(S, s, r, w[:, None], ng, 1)
        np.testing.assert_allclose(np.asarray(flat), np.asarray(col),
                                   rtol=1e-6)

    def test_maxcut_col_weight(self):
        s, r, w, S, ng = self._coo()
        scores = jnp.tanh(S[:, 0] - 0.5)
        flat = L.maxcut_loss(scores, s, r, w, ng, 1)
        col = L.maxcut_loss(scores, s, r, w[:, None], ng, 1)
        np.testing.assert_allclose(np.asarray(flat), np.asarray(col),
                                   rtol=1e-6)

    def test_spmm_col_weight(self):
        from tgp_tpu.ops.sparse import spmm
        s, r, w, S, _ = self._coo()
        flat = spmm(s, r, w, S, 8)
        col = spmm(s, r, w[:, None], S, 8)
        np.testing.assert_allclose(np.asarray(flat), np.asarray(col))

    def test_bad_shape_raises(self):
        from tgp_tpu.ops.sparse import check_and_filter_edge_weights
        with pytest.raises(ValueError, match=r"\[E\] or \[E, 1\]"):
            check_and_filter_edge_weights(jnp.ones((5, 2)))
        assert check_and_filter_edge_weights(None) is None
        w = jnp.ones(5)
        assert check_and_filter_edge_weights(w).shape == (5,)
        assert check_and_filter_edge_weights(w[:, None]).shape == (5,)
