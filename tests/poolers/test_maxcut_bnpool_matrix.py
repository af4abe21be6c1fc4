"""MaxCut activation×assignment×cache and BNPool prior/posterior interaction
matrices (VERDICT r3 #8 — the reference's densest per-pooler suites:
tests/poolers/test_maxcut.py 1211 LoC activation/assignment/cache cases,
test_bnpool.py 896 LoC prior/posterior edge regimes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tgp_tpu.graph import DenseGraphBatch, from_graphs, to_dense
from tgp_tpu.poolers import get_pooler
from tgp_tpu.select.base import SelectOutput
from tgp_tpu.select.topk import topk_select_from_scores
from tests.utils_graphs import make_batch

SAMPLE = {"sample": jax.random.key(42)}


@pytest.fixture(scope="module")
def batch():
    return make_batch([8, 5, 11], num_features=6, seed=9, weighted=True,
                      pad_nodes=32, pad_edges=160)


# ---------------------------------------------------------------------------
# MaxCut: activation × assignment × cache interactions
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("mp_act,mlp_act,act", [
    ("tanh", "relu", "tanh"),        # reference defaults
    ("relu", "tanh", "sigmoid"),
    ("identity", "identity", "identity"),
    ("elu", "leaky_relu", "tanh"),
])
def test_maxcut_activation_matrix(batch, mp_act, mlp_act, act):
    """Every activation combination must produce finite scores/losses; a
    bounded final activation bounds the stored scores (reference:
    test_score_net_different_activations / test_maxcut_pooling_act_identity)."""
    pooler = get_pooler("maxcut", in_channels=6, ratio=0.5, max_iter=2,
                        mp_units=(8, 8), mlp_units=(8,), mp_act=mp_act,
                        mlp_act=mlp_act, act=act)
    params = pooler.init(jax.random.key(0), batch)
    out = pooler.apply(params, batch)
    scores = np.asarray(out.so.extras["scores"])
    assert np.isfinite(scores).all()
    if act == "tanh":
        assert (np.abs(scores) <= 1.0 + 1e-6).all()
    elif act == "sigmoid":
        assert (scores >= -1e-6).all() and (scores <= 1 + 1e-6).all()
    loss = out.get_loss_value("maxcut_loss")
    assert np.isfinite(float(loss))


@pytest.mark.parametrize("assign", [True, False])
@pytest.mark.parametrize("ratio", [0.25, 2])
def test_maxcut_assignment_x_ratio(batch, assign, ratio):
    """do_assign_all_nodes × {fractional, integer} ratio: with assignment on
    every valid node lands in a cluster; off, only the selected seeds do
    (reference: test_maxcut_select_assign_all_nodes_{true,false} ×
    test_maxcut_select_different_ratios)."""
    pooler = get_pooler("maxcut", in_channels=6, ratio=ratio, max_iter=4,
                        mp_units=(8,), mlp_units=(8,),
                        assign_all_nodes=assign)
    params = pooler.init(jax.random.key(1), batch)
    out = pooler.apply(params, batch)
    nm = np.asarray(batch.node_mask)
    npg = np.asarray(batch.nodes_per_graph())
    k_per = (np.ceil(ratio * npg).astype(int) if isinstance(ratio, float)
             else np.minimum(ratio, npg))
    assigned = np.asarray(out.so.node_sel_mask) & nm
    per_graph = np.bincount(np.asarray(batch.node_graph)[assigned],
                            minlength=batch.num_graphs)
    if assign:
        # total assignment (connected test graphs): everyone participates
        assert (per_graph == npg).all()
    else:
        assert (per_graph == k_per).all()


def test_maxcut_max_iter_fallback_vs_propagation(batch):
    """max_iter interaction with the totality fallback: assignment is ALWAYS
    total (reference guarantees every node a cluster,
    SelectOutput.assign_all_nodes), but with max_iter=0 no propagation runs,
    so every non-seed node is assigned by the deterministic fallback — the
    graph's lowest-id occupied supernode — whereas max_iter=6 spreads nodes
    across clusters by score propagation (reference:
    test_maxcut_select_max_iter variants)."""
    outs = {}
    for it in (0, 6):
        pooler = get_pooler("maxcut", in_channels=6, ratio=0.25, max_iter=it,
                            mp_units=(8,), mlp_units=(8,))
        params = pooler.init(jax.random.key(2), batch)
        outs[it] = pooler.apply(params, batch)
        sel = np.asarray(outs[it].so.node_sel_mask)
        # totality: every valid node lands in a cluster either way
        assert (sel & np.asarray(batch.node_mask)).sum() == \
            np.asarray(batch.node_mask).sum()

    nm = np.asarray(batch.node_mask)
    ng = np.asarray(batch.node_graph)
    ci0 = np.asarray(outs[0].so.cluster_index)
    cg = np.asarray(outs[0].so.cluster_graph)
    seeds = np.asarray(
        topk_select_from_scores(
            outs[0].so.extras["scores"], batch, 0.25, None,
            "transpose").node_sel_mask)
    for g in range(batch.num_graphs):
        non_seed = nm & ~seeds & (ng == g)
        if not non_seed.any():
            continue
        # all fallback-assigned nodes share the graph's first occupied cluster
        first_occ = np.flatnonzero((cg == g) & np.isin(
            np.arange(len(cg)), ci0[seeds & (ng == g)]))[0]
        assert (ci0[non_seed] == first_occ).all()
    # propagation produces a different (non-degenerate) assignment
    ci6 = np.asarray(outs[6].so.cluster_index)
    assert (ci0[nm] != ci6[nm]).any() or len(set(ci6[nm])) > len(
        set(ci0[nm & ~seeds]))


def test_maxcut_unweighted_equals_unit_weights(batch):
    """edge_weight=None and explicit all-ones weights are the same graph
    (reference: test_maxcut_loss_no_edge_weights /
    test_maxcut_select_none_edge_weight_coverage)."""
    unit = batch.replace(edge_weight=jnp.ones_like(batch.edge_weight))
    pooler = get_pooler("maxcut", in_channels=6, ratio=0.5, max_iter=2,
                        mp_units=(8,), mlp_units=(8,))
    params = pooler.init(jax.random.key(3), unit)
    a = pooler.apply(params, unit)
    b = pooler.apply(params, batch.replace(
        edge_weight=jnp.ones_like(batch.edge_weight)))
    np.testing.assert_allclose(np.asarray(a.so.extras["scores"]),
                               np.asarray(b.so.extras["scores"]), rtol=1e-6)
    # weighted input changes the loss (weights enter the cut objective)
    c = pooler.apply(params, batch)
    assert not np.allclose(float(a.get_loss_value("maxcut_loss")),
                           float(c.get_loss_value("maxcut_loss")), rtol=1e-4)


def test_maxcut_edgeless_graph_finite():
    """A fully edgeless graph in the batch: selection still picks k nodes,
    the cut loss stays finite (reference:
    test_maxcut_loss_with_batched_isolated_nodes /
    test_maxcut_loss_all_isolated_nodes)."""
    rng = np.random.default_rng(5)
    g0 = (rng.normal(size=(6, 6)).astype(np.float32),
          np.zeros((2, 0), np.int64))
    s = np.arange(4)
    g1 = (rng.normal(size=(5, 6)).astype(np.float32),
          np.concatenate([np.stack([s, s + 1]), np.stack([s + 1, s])], 1))
    b = from_graphs([g0, g1], pad_nodes=16, pad_edges=32)
    pooler = get_pooler("maxcut", in_channels=6, ratio=0.5, max_iter=2,
                        mp_units=(8,), mlp_units=(8,))
    params = pooler.init(jax.random.key(4), b)
    out = pooler.apply(params, b)
    assert np.isfinite(float(out.get_loss_value("maxcut_loss")))
    assert np.isfinite(np.asarray(out.graph.x)).all()
    counts = np.bincount(
        np.asarray(b.node_graph)[np.asarray(out.so.node_sel_mask)
                                 & np.asarray(b.node_mask)],
        minlength=2)
    assert counts[0] >= 3  # ceil(0.5·6) seeds survive with no propagation


def test_maxcut_cached_so_loss_and_graph_identical(batch):
    """Cache interaction: feeding the captured SelectOutput back must skip
    selection and reproduce the pooled graph AND every loss term — even
    through a model with different selector hyperparameters, since the
    cached `so` carries the scores the loss needs (reference:
    test_maxcut_pooling_no_scores_fallback + precomputed-select cases)."""
    pooler = get_pooler("maxcut", in_channels=6, ratio=0.5, max_iter=2,
                        mp_units=(8,), mlp_units=(8,))
    params = pooler.init(jax.random.key(6), batch)
    out = pooler.apply(params, batch)

    replay = pooler.apply(params, batch, so=out.so)
    np.testing.assert_allclose(np.asarray(out.graph.x),
                               np.asarray(replay.graph.x), rtol=1e-6)
    for k in out.loss:
        np.testing.assert_allclose(float(out.loss[k]),
                                   float(replay.loss[k]), rtol=1e-6)

    other = get_pooler("maxcut", in_channels=6, ratio=0.5, max_iter=2,
                       mp_units=(4, 4), mlp_units=(4,), act="sigmoid")
    other_params = other.init(jax.random.key(7), batch)
    cross = other.apply(other_params, batch, so=out.so)
    np.testing.assert_allclose(np.asarray(out.graph.x),
                               np.asarray(cross.graph.x), rtol=1e-6)
    np.testing.assert_allclose(float(out.get_loss_value("maxcut_loss")),
                               float(cross.get_loss_value("maxcut_loss")),
                               rtol=1e-6)


def test_maxcut_min_score_interplay(batch):
    """min_score thresholds the kept seeds below the ratio budget (reference:
    min_score semantics shared with topk, tgp/select/base_select.py; the
    reference pooler does not surface min_score either — select-level knob)."""
    from tgp_tpu.select.maxcut import MaxCutSelect

    sel = MaxCutSelect(in_channels=6, ratio=1.0, max_iter=0, mp_units=(8,),
                       mlp_units=(8,), min_score=0.35,
                       do_assign_all_nodes=False)
    params = sel.init(jax.random.key(8), batch)
    so = sel.apply(params, batch)
    scores = np.asarray(so.extras["scores"])
    kept = np.asarray(so.node_sel_mask) & np.asarray(batch.node_mask)
    assert (scores[kept] > 0.35 - 1e-6).all()
    dropped = ~kept & np.asarray(batch.node_mask)
    if dropped.any():
        assert (scores[dropped] <= 0.35 + 1e-6).all()


# ---------------------------------------------------------------------------
# BNPool: prior/posterior edge regimes
# ---------------------------------------------------------------------------


def _two_block_dense(n_per=4, b=2, f=6, seed=0):
    """[B, 2·n_per] dense batch whose adjacency is two disjoint cliques
    (self-loops kept, so the block reconstruction SKSᵀ with diagonal K can
    be EXACT — diag(A)=1 within blocks, like the reference's perfect-prior
    fixtures)."""
    rng = np.random.default_rng(seed)
    n = 2 * n_per
    blk = np.kron(np.eye(2), np.ones((n_per, n_per)))
    adj = np.tile(blk[None], (b, 1, 1)).astype(np.float32)
    x = rng.normal(size=(b, n, f)).astype(np.float32)
    mask = np.ones((b, n), bool)
    return DenseGraphBatch(x=jnp.asarray(x), adj=jnp.asarray(adj),
                           mask=jnp.asarray(mask))


def _perfect_so(dense, k):
    """One-hot S matching the two blocks + posterior == prior extras."""
    b, n = dense.mask.shape
    half = n // 2
    s = np.zeros((b, n, k), np.float32)
    s[:, :half, 0] = 1.0
    s[:, half:, 1] = 1.0
    extras = {"q_alpha": jnp.ones((b, n, k - 1)),
              "q_beta": jnp.ones((b, n, k - 1))}
    return SelectOutput(s=jnp.asarray(s), in_mask=dense.mask,
                        num_clusters=k, num_graphs=b, max_clusters=k,
                        extras=extras)


def test_bnpool_perfect_reconstruction_quality_near_zero():
    """With S matching the true two-block structure and a strong diagonal K,
    SKSᵀ reconstructs A and the class-balanced BCE quality term → ~0; with
    posterior == Beta(1, α_DP=1) prior the KL term is exactly 0 (reference:
    test_zero_loss_with_perfect_prior / test_perfect_reconstruction)."""
    dense = _two_block_dense()
    k = 2
    pooler = get_pooler("bnpool", in_channels=6, k=k, train_K=False)
    params = pooler.init({"params": jax.random.key(0), **SAMPLE}, dense)
    big = 60.0
    eye = np.eye(k, dtype=np.float32)
    params = jax.tree_util.tree_map(lambda x: x, params)
    params["params"]["K"] = jnp.asarray(big * eye - big * (1 - eye))
    so = _perfect_so(dense, k)
    out = pooler.apply(params, dense, so=so, rngs=SAMPLE)
    assert float(out.loss["quality"]) < 1e-4
    assert float(out.loss["kl"]) == pytest.approx(0.0, abs=1e-6)
    assert float(out.loss["K_prior"]) == 0.0  # train_K=False zeroes it
    # flipping K's sign makes the reconstruction maximally wrong
    params["params"]["K"] = -params["params"]["K"]
    worse = pooler.apply(params, dense, so=so, rngs=SAMPLE)
    assert float(worse.loss["quality"]) > 1.0


def test_bnpool_alpha_dp_moves_kl():
    """α_DP reshapes the stick-breaking prior: a posterior at Beta(1,1)
    has zero KL against α_DP=1 but positive KL against α_DP=5
    (reference: prior-sensitivity cases in TestBNPoolKL)."""
    dense = _two_block_dense()
    so = _perfect_so(dense, 2)
    kls = {}
    for a in (1.0, 5.0):
        pooler = get_pooler("bnpool", in_channels=6, k=2, alpha_DP=a)
        params = pooler.init({"params": jax.random.key(0), **SAMPLE}, dense)
        out = pooler.apply(params, dense, so=so, rngs=SAMPLE)
        kls[a] = float(out.loss["kl"])
    assert kls[1.0] == pytest.approx(0.0, abs=1e-6)
    assert kls[5.0] > 1e-4


def test_bnpool_num_neg_samples_cap():
    """The unbatched sparse loss caps negatives per graph at
    num_neg_samples (reference bnpool.py:135-139): the capped mask admits
    at most `cap` negatives per graph, and the loss changes."""
    from tgp_tpu.ops.sampling import cap_samples_per_graph

    b = make_batch([10, 7], num_features=6, seed=3, pad_nodes=24,
                   pad_edges=96)
    rng = np.random.default_rng(0)
    mask = jnp.asarray(rng.random(20) < 0.8)
    graph = jnp.asarray(rng.integers(0, 2, 20))
    capped = cap_samples_per_graph(mask, graph, 2, cap=3)
    per = np.bincount(np.asarray(graph)[np.asarray(capped)], minlength=2)
    assert (per <= 3).all()
    assert np.asarray(capped & ~mask).sum() == 0  # never un-masks

    losses = {}
    for cap in (None, 1):
        pooler = get_pooler("bnpool_u", in_channels=6, k=4,
                            num_neg_samples=cap)
        params = pooler.init({"params": jax.random.key(1), **SAMPLE}, b)
        out = pooler.apply(params, b, rngs=SAMPLE)
        losses[cap] = float(out.loss["quality"])
        assert np.isfinite(losses[cap])
    assert losses[None] != pytest.approx(losses[1], rel=1e-6)


def test_bnpool_padding_invariance():
    """Mask regime: re-padding the same graphs to a larger Nmax must not
    change any loss term (the reference's variable-mask cases,
    TestBNPoolLoss::test_with_variable_masks).  The assignment is pinned via
    ``so=`` — the Beta rsample itself is shape-dependent (vectorized
    counter RNG), so invariance is a property of the masked losses, not of
    the raw draws."""
    k = 3
    graphs = [(np.random.default_rng(7).normal(size=(n, 6)).astype(np.float32),
               _path_edges(n)) for n in (5, 9)]
    rng = np.random.default_rng(11)
    s_real = [rng.dirichlet(np.ones(k), size=n).astype(np.float32)
              for n in (5, 9)]
    pooler = get_pooler("bnpool", in_channels=6, k=k)
    outs = []
    for pad in (12, 20):
        b = to_dense(from_graphs(graphs, pad_nodes=2 * pad, pad_edges=64),
                     max_nodes=pad)
        s = np.zeros((2, pad, k), np.float32)
        qa = np.ones((2, pad, k - 1), np.float32)
        qb = np.full((2, pad, k - 1), 1.7, np.float32)
        for g, sr in enumerate(s_real):
            s[g, :sr.shape[0]] = sr
        so = SelectOutput(
            s=jnp.asarray(s), in_mask=b.mask, num_clusters=k, num_graphs=2,
            max_clusters=k,
            extras={"q_alpha": jnp.asarray(qa), "q_beta": jnp.asarray(qb)})
        params = pooler.init({"params": jax.random.key(2), **SAMPLE}, b)
        outs.append(pooler.apply(params, b, so=so))
    for key in outs[0].loss:
        np.testing.assert_allclose(float(outs[0].loss[key]),
                                   float(outs[1].loss[key]), rtol=1e-5,
                                   err_msg=key)


def _path_edges(n):
    s = np.arange(n - 1)
    return np.concatenate([np.stack([s, s + 1]), np.stack([s + 1, s])], 1)


def test_bnpool_dropout_mode_interaction():
    """deterministic flag gates the selector MLP dropout: eval mode is
    reproducible, train mode with different dropout keys differs
    (reference: test_bnpool_training_mode / test_bnpool_eval_mode)."""
    dense = _two_block_dense()
    # NOTE in_channels must be a LIST to get a hidden layer: like PyG's MLP,
    # dropout applies after every non-final layer, so a bare Linear
    # (int in_channels) has no dropout site (reference mlp_select.py:67).
    pooler = get_pooler("bnpool", in_channels=[6, 8], k=3, dropout=0.5)
    params = pooler.init({"params": jax.random.key(3), **SAMPLE}, dense)
    a = pooler.apply(params, dense, rngs=SAMPLE)
    b = pooler.apply(params, dense, rngs=SAMPLE)
    np.testing.assert_allclose(np.asarray(a.so.s), np.asarray(b.so.s))

    r1 = {"sample": jax.random.key(42), "dropout": jax.random.key(1)}
    r2 = {"sample": jax.random.key(42), "dropout": jax.random.key(2)}
    c = pooler.apply(params, dense, deterministic=False, rngs=r1)
    d = pooler.apply(params, dense, deterministic=False, rngs=r2)
    assert not np.allclose(np.asarray(c.so.s), np.asarray(d.so.s))
