"""Per-pooler hyperparameter branches, part 2: KMIS scorers/heuristics/k,
MaxCut knobs, ASAP, BNPool, DPSelect, dense-input path, transforms
(reference coverage model: tests/poolers/test_kmis.py, test_maxcut.py,
test_asap.py, test_bnpool.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.utils_graphs import make_batch
from tgp_tpu.graph import to_dense
from tgp_tpu.poolers import get_pooler


@pytest.fixture(scope="module")
def batch():
    return make_batch([12, 9], num_features=6, seed=11, weighted=True,
                      pad_nodes=24, pad_edges=128)


# ---------------------------------------------------------------- KMIS
@pytest.mark.parametrize("scorer", ["linear", "constant", "canonical",
                                    "degree", "random"])
def test_kmis_scorers(scorer, batch):
    pooler = get_pooler("kmis", in_channels=6, scorer=scorer)
    params = pooler.init(jax.random.key(0), batch)
    out = pooler.apply(params, batch)
    mis = np.asarray(out.so.extras["mis"])
    nm = np.asarray(batch.node_mask)
    s, r = np.asarray(batch.senders), np.asarray(batch.receivers)
    em = np.asarray(batch.edge_mask)
    # independence: no edge connects two MIS nodes (order_k=1)
    for e in np.nonzero(em)[0]:
        assert not (mis[s[e]] and mis[r[e]]), scorer
    # maximality: every non-MIS valid node has an MIS neighbor
    neigh_mis = np.zeros_like(mis)
    for e in np.nonzero(em)[0]:
        if mis[s[e]]:
            neigh_mis[r[e]] = True
    for i in np.nonzero(nm & ~mis)[0]:
        assert neigh_mis[i], f"{scorer}: node {i} not dominated"


def test_kmis_unknown_scorer(batch):
    pooler = get_pooler("kmis", in_channels=6, scorer="bogus")
    with pytest.raises(ValueError, match="scorer"):
        pooler.init(jax.random.key(0), batch)


@pytest.mark.parametrize("k", [1, 2])
def test_kmis_order_k_distance(k, batch):
    """k-MIS: any two MIS nodes are > k hops apart."""
    pooler = get_pooler("kmis", in_channels=6, scorer="constant", order_k=k)
    params = pooler.init(jax.random.key(0), batch)
    out = pooler.apply(params, batch)
    mis = np.asarray(out.so.extras["mis"])
    N = batch.num_nodes
    adj = np.zeros((N, N), bool)
    s, r = np.asarray(batch.senders), np.asarray(batch.receivers)
    em = np.asarray(batch.edge_mask)
    adj[s[em], r[em]] = True
    reach = adj.copy()
    for _ in range(k - 1):
        reach = reach | (reach @ adj)
    mi = np.nonzero(mis)[0]
    for a in mi:
        for b in mi:
            if a != b:
                assert not reach[a, b], (k, a, b)


@pytest.mark.parametrize("heuristic", [None, "greedy", "w-greedy"])
def test_kmis_heuristics_run(heuristic, batch):
    pooler = get_pooler("kmis", in_channels=6, score_heuristic=heuristic)
    params = pooler.init(jax.random.key(0), batch)
    out = pooler.apply(params, batch)
    assert np.isfinite(np.asarray(out.graph.x)).all()


def test_kmis_reduce_red_op_none_keeps_mis_features(batch):
    """reduce_red_op=None: pooled x = MIS nodes' own features (reference
    KMISPooling x_red_op=None semantics)."""
    pooler = get_pooler("kmis", in_channels=6, scorer="constant",
                        reduce_red_op=None)
    params = pooler.init(jax.random.key(0), batch)
    out = pooler.apply(params, batch)
    mis = np.asarray(out.so.extras["mis"])
    xn = np.asarray(batch.x)
    got = np.asarray(out.graph.x)
    ci = np.asarray(out.so.cluster_index)
    for i in np.nonzero(mis)[0]:
        np.testing.assert_allclose(got[ci[i]], xn[i], rtol=1e-5,
                                   err_msg=str(i))


# --------------------------------------------------------------- MaxCut
def test_maxcut_knobs(batch):
    pooler = get_pooler("maxcut", in_channels=6, ratio=0.4, max_iter=2,
                        delta=1.5, mp_units=[8], mlp_units=[8],
                        loss_coeff=2.0)
    params = pooler.init(jax.random.key(0), batch)
    out = pooler.apply(params, batch)
    assert "maxcut_loss" in out.loss
    # maxcut assigns ALL nodes to ratio·n supernodes (assign_all_nodes,
    # reference maxcut semantics): count out_mask slots per graph
    om = np.asarray(out.graph.node_mask)
    cg = np.asarray(out.graph.node_graph)
    for g, n in enumerate([12, 9]):
        assert om[cg == g].sum() == int(np.ceil(0.4 * n))


def test_maxcut_loss_coeff_scales(batch):
    p1 = get_pooler("maxcut", in_channels=6, loss_coeff=1.0)
    params = p1.init(jax.random.key(0), batch)
    l1 = float(p1.apply(params, batch).loss["maxcut_loss"])
    p2 = get_pooler("maxcut", in_channels=6, loss_coeff=3.0)
    l2 = float(p2.apply(params, batch).loss["maxcut_loss"])
    np.testing.assert_allclose(l2, 3.0 * l1, rtol=1e-5)


# ----------------------------------------------------------------- ASAP
def test_asap_ratio_and_leconv_score(batch):
    pooler = get_pooler("asap", in_channels=6, ratio=0.5)
    params = pooler.init(jax.random.key(0), batch)
    out = pooler.apply(params, batch)
    sel = np.asarray(out.so.node_sel_mask)
    ng = np.asarray(out.so.node_graph)
    for g, n in enumerate([12, 9]):
        assert sel[ng == g].sum() == int(np.ceil(0.5 * n))
    # gradient flows through the LEConv fitness net
    def loss(p):
        o = pooler.apply(p, batch)
        return jnp.sum(o.graph.x ** 2)
    g = jax.grad(loss)(params)
    assert any(bool(jnp.any(l != 0)) for l in jax.tree_util.tree_leaves(g))


# --------------------------------------------------------------- BNPool
def test_bnpool_loss_terms_and_eta(batch):
    pooler = get_pooler("bnpool", in_channels=6, k=4)
    params = pooler.init({"params": jax.random.key(0),
                          "sample": jax.random.key(1)}, batch)
    out = pooler.apply(params, batch, rngs={"sample": jax.random.key(2)})
    assert {"quality", "kl", "K_prior"} <= set(out.loss)
    p2 = get_pooler("bnpool", in_channels=6, k=4, eta=5.0)
    out2 = p2.apply(params, batch, rngs={"sample": jax.random.key(2)})
    np.testing.assert_allclose(float(out2.loss["kl"]),
                               5.0 * float(out.loss["kl"]), rtol=1e-5)


def test_bnpool_sampling_reproducible(batch):
    """The DP selector rsamples even at eval (reference dp_select.py:135 —
    no eval branch): same rng key → identical output, different keys →
    different samples."""
    pooler = get_pooler("bnpool", in_channels=6, k=4)
    params = pooler.init({"params": jax.random.key(0),
                          "sample": jax.random.key(1)}, batch)
    a = pooler.apply(params, batch, rngs={"sample": jax.random.key(7)})
    b = pooler.apply(params, batch, rngs={"sample": jax.random.key(7)})
    c = pooler.apply(params, batch, rngs={"sample": jax.random.key(8)})
    np.testing.assert_allclose(np.asarray(a.dense.x), np.asarray(b.dense.x),
                               rtol=1e-6)
    assert not np.allclose(np.asarray(a.dense.x), np.asarray(c.dense.x))


# ------------------------------------------------------ dense input path
@pytest.mark.parametrize("alias", ["mincut", "diff"])
def test_pre_densified_input(alias, batch):
    """Dense poolers accept a pre-densified DenseGraphBatch (reference
    _ensure_batched_inputs, src.py:454-491)."""
    dense = to_dense(batch)
    pooler = get_pooler(alias, in_channels=6, k=4)
    params = pooler.init(jax.random.key(0), batch)
    out_sparse = pooler.apply(params, batch)
    out_dense = pooler.apply(params, dense)
    np.testing.assert_allclose(np.asarray(out_dense.dense.x),
                               np.asarray(out_sparse.dense.x), rtol=1e-4,
                               atol=1e-5)
    for name in out_sparse.loss:
        np.testing.assert_allclose(float(out_dense.loss[name]),
                                   float(out_sparse.loss[name]), rtol=1e-4)


# -------------------------------------------------------------- DPSelect
def test_dp_select_stick_breaking(batch):
    """DPSelect rows are sub-stochastic (stick-breaking weights ≤ 1)."""
    from tgp_tpu.select.dp import DPSelect

    dense = to_dense(batch)
    sel = DPSelect(in_channels=6, k=5)
    params = sel.init({"params": jax.random.key(0),
                       "sample": jax.random.key(1)}, dense)
    so = sel.apply(params, dense, rngs={"sample": jax.random.key(2)})
    S = np.asarray(so.s)
    m = np.asarray(dense.mask)
    assert (S[m].sum(-1) <= 1.0 + 1e-5).all()
    assert (S[m] >= -1e-7).all()


# ------------------------------------------------------------ transforms
def test_normalize_adj_transform():
    """NormalizeAdj: output == (1-δ)I + δ D^-1/2 A D^-1/2 (dense oracle)."""
    from tests.utils_graphs import erdos_renyi_graph
    from tgp_tpu.data.transforms import NormalizeAdj

    x, ei = erdos_renyi_graph(10, p=0.4, seed=4)
    x2, ei2, w2 = NormalizeAdj(delta=0.85)((x, ei))
    n = x.shape[0]
    A = np.zeros((n, n))
    A[ei[0], ei[1]] = 1.0
    d = A.sum(1)
    dinv = np.where(d > 0, 1.0 / np.sqrt(np.maximum(d, 1e-12)), 0.0)
    want = 0.15 * np.eye(n) + 0.85 * dinv[:, None] * A * dinv[None, :]
    got = np.zeros((n, n))
    got[ei2[0], ei2[1]] = w2
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_sort_nodes_transform():
    from tests.utils_graphs import erdos_renyi_graph
    from tgp_tpu.data.transforms import SortNodes

    x, ei = erdos_renyi_graph(12, p=0.3, seed=4)
    y = np.random.default_rng(0).integers(0, 3, 12)
    out = SortNodes()((x, ei, np.ones(ei.shape[1], np.float32), y))
    x2, ei2, w2, y2 = out
    assert (np.diff(y2) >= 0).all()
    # edges remapped consistently: same multiset of (y_s, y_r) pairs
    pairs_a = sorted(zip(y[ei[0]], y[ei[1]]))
    pairs_b = sorted(zip(y2[ei2[0]], y2[ei2[1]]))
    assert pairs_a == pairs_b


def test_kmis_random_scorer_without_rng_stream(batch):
    """No 'sample' stream: the documented deterministic index-hash fallback
    (docs/migration.md) — same ranks every apply."""
    from tgp_tpu.select.kmis import KMISSelect

    sel = KMISSelect(scorer="random")
    params = sel.init(jax.random.key(0), batch)
    a = sel.apply(params, batch)
    b = sel.apply(params, batch)
    np.testing.assert_array_equal(np.asarray(a.cluster_index),
                                  np.asarray(b.cluster_index))


def test_kmis_force_undirected_on_directed_input(batch):
    """force_undirected symmetrizes+coalesces before the MIS: on a
    directed input the MIS must be valid for the SYMMETRIZED graph."""
    from tgp_tpu.select.kmis import KMISSelect

    # strip the reverse edges: keep only s < r
    s = np.asarray(batch.senders)
    r = np.asarray(batch.receivers)
    em = np.asarray(batch.edge_mask) & (s < r)
    directed = batch.replace(edge_mask=jnp.asarray(em))

    sel = KMISSelect(scorer="degree", force_undirected=True)
    params = sel.init(jax.random.key(0), directed)
    so = sel.apply(params, directed)
    mis = np.asarray(so.extras["mis"])
    # independence w.r.t. the undirected closure (the MIS itself rides in
    # extras; node_sel_mask marks the TOTAL assignment)
    for a, b_ in zip(s[em], r[em]):
        assert not (mis[a] and mis[b_])


def test_kmis_mis_impl_forced_sparse_matches_dense(batch):
    from tgp_tpu.select.kmis import KMISSelect

    outs = {}
    for impl in ("dense", "sparse"):
        sel = KMISSelect(scorer="degree", mis_impl=impl)
        params = sel.init(jax.random.key(0), batch)
        outs[impl] = sel.apply(params, batch)
    np.testing.assert_array_equal(
        np.asarray(outs["dense"].node_sel_mask),
        np.asarray(outs["sparse"].node_sel_mask))
