"""Deep behavioral matrices for MaxCutPooling and BNPool (reference:
tests/poolers/test_maxcut.py 1211 LoC, test_bnpool.py 896 LoC)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tgp_tpu.losses as L
from tgp_tpu.graph import from_graphs, to_dense
from tgp_tpu.poolers import get_pooler
from tests.utils_graphs import erdos_renyi_graph, make_batch


def _rngs(i):
    """BNPool draws from the 'sample' PRNG stream at init and apply time
    (reparameterized Beta posterior samples at train AND eval)."""
    return {"params": jax.random.key(i), "sample": jax.random.key(100 + i)}


SAMPLE = {"sample": jax.random.key(42)}


@pytest.fixture(scope="module")
def batch():
    return make_batch([8, 5, 11], num_features=6, seed=9, weighted=True,
                      pad_nodes=32, pad_edges=160)


@pytest.fixture(scope="module")
def isolated_batch():
    """Graph 0 has 2 isolated nodes; graph 1 is fully edgeless."""
    rng = np.random.default_rng(21)
    x0 = rng.normal(size=(8, 6)).astype(np.float32)
    s = np.arange(5)
    ei0 = np.concatenate([np.stack([s, s + 1]), np.stack([s + 1, s])], 1)
    x1 = rng.normal(size=(4, 6)).astype(np.float32)
    ei1 = np.zeros((2, 0), np.int64)
    x2, ei2 = erdos_renyi_graph(9, p=0.4, num_features=6, seed=23)
    return from_graphs([(x0, ei0), (x1, ei1), (x2, ei2)],
                       pad_nodes=32, pad_edges=128)


# ---------------------------------------------------------------------------
# MaxCut
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("ratio", [0.25, 0.5, 0.75])
def test_maxcut_ratios_total_assignment(batch, ratio):
    pooler = get_pooler("maxcut", in_channels=6, ratio=ratio, max_iter=3)
    params = pooler.init(jax.random.key(0), batch)
    out = pooler.apply(params, batch)
    so = out.so
    # total assignment: every valid node participates
    nm = np.asarray(so.node_mask)
    assert np.asarray(so.node_sel_mask)[nm].all()
    # supernode budget = ceil(ratio · n_g) per graph
    counts = np.asarray(out.graph.nodes_per_graph())
    expect = np.ceil(ratio * np.asarray(batch.nodes_per_graph())).astype(int)
    np.testing.assert_array_equal(counts, expect)
    # every assigned cluster id points at a valid supernode of the same graph
    ci = np.asarray(so.cluster_index)[nm]
    cg = np.asarray(so.cluster_graph)
    np.testing.assert_array_equal(cg[ci], np.asarray(so.node_graph)[nm])


def test_maxcut_isolated_nodes_covered(isolated_batch):
    """assign_all_nodes must place isolated nodes (BFS rounds can't reach
    them → reference-parity random fallback, tgp/utils/ops.py:1177-1219)."""
    pooler = get_pooler("maxcut", in_channels=6, ratio=0.5, max_iter=3)
    params = pooler.init(jax.random.key(1), isolated_batch)
    out = pooler.apply(params, isolated_batch)
    so = out.so
    nm = np.asarray(so.node_mask)
    assert np.asarray(so.node_sel_mask)[nm].all()
    assert np.isfinite(np.asarray(out.graph.x)).all()
    assert np.isfinite(float(out.loss["maxcut_loss"]))


def test_maxcut_scores_extra_and_range(batch):
    pooler = get_pooler("maxcut", in_channels=6, ratio=0.5)
    params = pooler.init(jax.random.key(0), batch)
    so = pooler.apply(params, batch).so
    z = np.asarray(so.extras["scores"])
    assert z.shape == (batch.num_nodes,)
    assert (np.abs(z) <= 1.0 + 1e-6).all()  # tanh-activated score


def test_maxcut_scorenet_grad_reaches_mp_layers(batch):
    pooler = get_pooler("maxcut", in_channels=6, ratio=0.5,
                        mp_units=(4, 4), mlp_units=(8,))
    params = pooler.init(jax.random.key(0), batch)

    def loss(p):
        out = pooler.apply(p, batch)
        return out.loss["maxcut_loss"] + jnp.sum(out.graph.x ** 2)

    g = jax.grad(loss)(params)
    flat = jax.tree_util.tree_flatten_with_path(g)[0]
    mp_nonzero = [bool(jnp.any(l != 0)) for path, l in flat
                  if "score_net" in str(path).lower()
                  or "scorenet" in str(path).lower()
                  or "MaxCutScoreNet" in str(path)]
    assert mp_nonzero and any(mp_nonzero)


def test_maxcut_lifting_roundtrip(batch):
    pooler = get_pooler("maxcut", in_channels=6, ratio=0.5)
    params = pooler.init(jax.random.key(0), batch)
    out = pooler.apply(params, batch)
    lifted = pooler.apply(params, batch, so=out.so, lifting=True,
                          x=out.graph.x)
    assert lifted.shape == (batch.num_nodes, 6)
    nm = np.asarray(batch.node_mask)
    np.testing.assert_array_equal(np.asarray(lifted)[~nm], 0.0)
    # lifted features of a node = features of its supernode (s_inv transpose
    # with unit weights on a hard assignment)
    ci = np.asarray(out.so.cluster_index)
    w = np.asarray(out.so.weight)
    xp = np.asarray(out.graph.x)
    got = np.asarray(lifted)[nm]
    expect = xp[ci[nm]] * w[nm][:, None]
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)


def test_maxcut_mp_impl_parity(batch):
    """'dense' (batched-matmul voting/propagation) and 'sparse' (scatter)
    engines produce the same selection given the same params."""
    dense_p = get_pooler("maxcut", in_channels=6, ratio=0.5,
                         mp_impl="dense")
    sparse_p = get_pooler("maxcut", in_channels=6, ratio=0.5,
                          mp_impl="sparse")
    params = dense_p.init(jax.random.key(0), batch)
    so_d = dense_p.apply(params, batch).so
    so_s = sparse_p.apply(params, batch).so
    nm = np.asarray(so_d.node_mask)
    np.testing.assert_array_equal(np.asarray(so_d.cluster_index)[nm],
                                  np.asarray(so_s.cluster_index)[nm])
    np.testing.assert_allclose(np.asarray(so_d.extras["scores"]),
                               np.asarray(so_s.extras["scores"]),
                               rtol=1e-4, atol=1e-5)


def test_maxcut_pass_so_skips_selection(batch):
    """Reference caching semantics: passing ``so=`` reuses the selection
    (tgp/src.py:178-186) — output is identical and independent of params
    reinitialization."""
    pooler = get_pooler("maxcut", in_channels=6, ratio=0.5)
    params = pooler.init(jax.random.key(0), batch)
    out1 = pooler.apply(params, batch)
    out2 = pooler.apply(params, batch, so=out1.so)
    np.testing.assert_allclose(np.asarray(out1.graph.x),
                               np.asarray(out2.graph.x), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(out1.graph.senders),
                                  np.asarray(out2.graph.senders))


def test_maxcut_loss_optimum_sign(batch):
    """maxcut_loss of the learned z must lie in [−1, 1] (−zᵀAz/vol with
    |z| ≤ 1); optimizing decreases it below the random-z value on average —
    here just pin the bound."""
    pooler = get_pooler("maxcut", in_channels=6, ratio=0.5)
    params = pooler.init(jax.random.key(0), batch)
    val = float(pooler.apply(params, batch).loss["maxcut_loss"])
    assert -1.0 - 1e-5 <= val <= 1.0 + 1e-5


# ---------------------------------------------------------------------------
# BNPool
# ---------------------------------------------------------------------------


def test_bnpool_k_param_init_structure(batch):
    """K initializes to K_init·(2I − 1): attractive diagonal, repulsive
    off-diagonal (reference bnpool.py:220-225)."""
    pooler = get_pooler("bnpool", in_channels=6, k=4, K_init=2.0)
    params = pooler.init(_rngs(0), batch)
    K = np.asarray(params["params"]["K"])
    assert K.shape == (4, 4)
    np.testing.assert_allclose(np.diag(K), 2.0)
    off = K[~np.eye(4, dtype=bool)]
    np.testing.assert_allclose(off, -2.0)


def test_bnpool_train_k_false_zeroes_prior(batch):
    pooler = get_pooler("bnpool", in_channels=6, k=4, train_K=False)
    params = pooler.init(_rngs(0), batch)
    out = pooler.apply(params, batch, rngs=SAMPLE)
    assert float(out.loss["K_prior"]) == 0.0
    p2 = get_pooler("bnpool", in_channels=6, k=4, train_K=True)
    out2 = p2.apply(params, batch, rngs=SAMPLE)
    assert float(out2.loss["K_prior"]) != 0.0


def test_bnpool_quality_matches_manual_bce(batch):
    """quality = class-balanced BCE of A_rec = S K Sᵀ normalized by Σn_g²
    (reference bnpool compute_loss)."""
    pooler = get_pooler("bnpool", in_channels=6, k=4)
    params = pooler.init(_rngs(0), batch)
    out = pooler.apply(params, batch, rngs=SAMPLE)
    d = to_dense(batch)
    S = out.so.s
    K = params["params"]["K"]
    rec = jnp.einsum("bnk,kj,bmj->bnm", S, K, S)
    N = d.mask.sum(-1)
    manual = L.weighted_bce_reconstruction_loss(
        rec, d.adj, mask=d.mask, balance_links=True,
        normalizing_const=(N * N).astype(S.dtype))
    np.testing.assert_allclose(float(out.loss["quality"]), float(manual),
                               rtol=1e-5)


def test_bnpool_unbatched_sample_keys(batch):
    """Unbatched mode draws ± edges from the 'sample' stream: same key →
    same losses, different key → different quality."""
    pooler = get_pooler("bnpool_u", in_channels=6, k=4)
    params = pooler.init(_rngs(0), batch)
    l1 = pooler.apply(params, batch, rngs={"sample": jax.random.key(7)}).loss
    l2 = pooler.apply(params, batch, rngs={"sample": jax.random.key(7)}).loss
    l3 = pooler.apply(params, batch, rngs={"sample": jax.random.key(8)}).loss
    assert float(l1["quality"]) == float(l2["quality"])
    assert float(l1["quality"]) != float(l3["quality"])
    assert float(l1["kl"]) == float(l2["kl"])
    # kl differs across keys only through the valid-sample-count normalizer
    # (collisions are key-dependent), so it stays within a few percent
    np.testing.assert_allclose(float(l1["kl"]), float(l3["kl"]), rtol=0.1)


def test_bnpool_sparse_output_block_diag(batch):
    pooler = get_pooler("bnpool", in_channels=6, k=4, sparse_output=True)
    params = pooler.init(_rngs(0), batch)
    out = pooler.apply(params, batch, rngs=SAMPLE)
    g = out.graph
    # block-diagonal: every edge stays within its graph
    em = np.asarray(g.edge_mask)
    ng = np.asarray(g.node_graph)
    s, r = np.asarray(g.senders)[em], np.asarray(g.receivers)[em]
    np.testing.assert_array_equal(ng[s], ng[r])
    assert np.isfinite(np.asarray(g.x)).all()


def test_bnpool_out_mask_semantics(batch):
    pooler = get_pooler("bnpool", in_channels=6, k=4)
    params = pooler.init(_rngs(0), batch)
    out = pooler.apply(params, batch, rngs=SAMPLE)
    m = np.asarray(out.dense.mask)
    assert m.shape == (batch.num_graphs, 4)
    # soft DP assignment touches every cluster column with nonzero mass
    S = np.asarray(out.so.s)
    col_mass = S.sum(1)
    np.testing.assert_array_equal(m, col_mass > 0)


def test_bnpool_eta_scales_kl_only(batch):
    pooler = get_pooler("bnpool", in_channels=6, k=4, eta=1.0)
    params = pooler.init(_rngs(0), batch)
    base = pooler.apply(params, batch, rngs=SAMPLE).loss
    p5 = get_pooler("bnpool", in_channels=6, k=4, eta=5.0)
    scaled = p5.apply(params, batch, rngs=SAMPLE).loss
    np.testing.assert_allclose(float(scaled["kl"]), 5 * float(base["kl"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(scaled["quality"]),
                               float(base["quality"]), rtol=1e-6)


def test_bnpool_isolated_and_edgeless_finite(isolated_batch):
    pooler = get_pooler("bnpool", in_channels=6, k=3)
    params = pooler.init(_rngs(0), isolated_batch)
    out = pooler.apply(params, isolated_batch, rngs=SAMPLE)
    for name, v in out.loss.items():
        assert np.isfinite(float(v)), name
    assert np.isfinite(np.asarray(out.dense.x)).all()


def test_bnpool_grad_reaches_k_and_selector(batch):
    pooler = get_pooler("bnpool", in_channels=6, k=4)
    params = pooler.init(_rngs(0), batch)

    def loss(p):
        out = pooler.apply(p, batch, rngs=SAMPLE)
        return out.loss_sum()

    g = jax.grad(loss)(params)
    assert bool(jnp.any(g["params"]["K"] != 0))
    others = [l for path, l in jax.tree_util.tree_flatten_with_path(g)[0]
              if "'K'" not in str(path)]
    assert any(bool(jnp.any(l != 0)) for l in others)
