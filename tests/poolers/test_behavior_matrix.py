"""Per-pooler hyperparameter-branch matrix (reference behavioral coverage:
tests/poolers/test_topk.py min_score/ratio/multiplier branches,
tests/poolers/test_dense_poolers_*.py sparse_output/adj_transpose branches,
tgp/select/topk_select.py:169-207, tgp/poolers/mincut.py:150-289)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.utils_graphs import make_batch
from tgp_tpu.graph import to_dense
from tgp_tpu.poolers import get_pooler

DENSE = ["mincut", "diff", "dmon", "hosc", "jb", "acc"]


@pytest.fixture(scope="module")
def batch():
    return make_batch([10, 7, 13], num_features=6, seed=5, weighted=True,
                      pad_nodes=32, pad_edges=160)


def _run(alias, batch, **kw):
    pooler = get_pooler(alias, in_channels=6, **kw)
    params = pooler.init(jax.random.key(0), batch)
    return pooler, params, pooler.apply(params, batch)


# ---------------------------------------------------------------- min_score
def test_min_score_softmax_scores(batch):
    """With min_score set, scores are a per-graph softmax
    (reference topk_select.py:169-207)."""
    _, _, out = _run("topk", batch, min_score=-1.0)  # threshold below all
    so = out.so
    w = np.asarray(so.weight)
    ng = np.asarray(so.node_graph)
    sel = np.asarray(so.node_sel_mask)
    nm = np.asarray(batch.node_mask)
    # all real nodes selected (threshold under the softmax minimum)
    assert (sel == nm).all()
    for g in range(batch.num_graphs):
        s = w[sel & (ng == g)].sum()
        np.testing.assert_allclose(s, 1.0, rtol=1e-4)


def test_min_score_selects_above_threshold(batch):
    _, _, out = _run("topk", batch, min_score=0.05)
    so = out.so
    w = np.asarray(so.weight)
    sel = np.asarray(so.node_sel_mask)
    ng = np.asarray(so.node_graph)
    # every selected node's softmax score exceeds min(max-eps, min_score)
    for g in range(batch.num_graphs):
        gsel = sel & (ng == g)
        assert gsel.sum() >= 1  # at least the argmax survives
        if gsel.sum() and w[gsel].min() < 0.05:
            # allowed only when the graph max is below min_score
            assert w[gsel].max() == pytest.approx(
                w[np.asarray(batch.node_mask) & (ng == g)].max())


def test_min_score_huge_keeps_only_argmax(batch):
    _, _, out = _run("topk", batch, min_score=10.0)  # above any softmax value
    so = out.so
    sel = np.asarray(so.node_sel_mask)
    ng = np.asarray(so.node_graph)
    for g in range(batch.num_graphs):
        assert sel[ng == g].sum() == 1


@pytest.mark.parametrize("alias", ["sag", "pan"])
def test_min_score_on_other_topk_family(alias, batch):
    _, _, out = _run(alias, batch, min_score=10.0)
    sel = np.asarray(out.so.node_sel_mask)
    ng = np.asarray(out.so.node_graph)
    for g in range(batch.num_graphs):
        assert sel[ng == g].sum() == 1, alias


# ------------------------------------------------------------------- ratio
def test_int_ratio_is_fixed_k(batch):
    _, _, out = _run("topk", batch, ratio=4)
    sel = np.asarray(out.so.node_sel_mask)
    ng = np.asarray(out.so.node_graph)
    for g, n in enumerate([10, 7, 13]):
        assert sel[ng == g].sum() == min(4, n)


def test_int_ratio_larger_than_graph(batch):
    _, _, out = _run("topk", batch, ratio=11)
    sel = np.asarray(out.so.node_sel_mask)
    ng = np.asarray(out.so.node_graph)
    for g, n in enumerate([10, 7, 13]):
        assert sel[ng == g].sum() == min(11, n)


def test_ratio_one_keeps_all(batch):
    _, _, out = _run("topk", batch, ratio=1.0)
    assert (np.asarray(out.so.node_sel_mask)
            == np.asarray(batch.node_mask)).all()


def test_fractional_ratio_ceil(batch):
    _, _, out = _run("topk", batch, ratio=0.3)
    sel = np.asarray(out.so.node_sel_mask)
    ng = np.asarray(out.so.node_graph)
    for g, n in enumerate([10, 7, 13]):
        assert sel[ng == g].sum() == int(np.ceil(0.3 * n))


# ------------------------------------------------------- multiplier / act
def test_multiplier_scales_features(batch):
    p1, params, out1 = _run("topk", batch, ratio=0.5)
    p2 = get_pooler("topk", in_channels=6, ratio=0.5, multiplier=3.0)
    out2 = p2.apply(params, batch)
    np.testing.assert_allclose(np.asarray(out2.graph.x),
                               3.0 * np.asarray(out1.graph.x), rtol=1e-5)


def test_act_identity_vs_tanh(batch):
    _, params, out_t = _run("topk", batch, ratio=1.0)  # tanh default
    p_id = get_pooler("topk", in_channels=6, ratio=1.0, act=None)
    out_i = p_id.apply(params, batch)
    wt = np.asarray(out_t.so.weight)
    wi = np.asarray(out_i.so.weight)
    sel = np.asarray(out_t.so.node_sel_mask)
    np.testing.assert_allclose(wt[sel], np.tanh(wi[sel]), rtol=1e-5,
                               atol=1e-6)


# ---------------------------------------------------- dense-family matrix
@pytest.mark.parametrize("alias", DENSE)
def test_sparse_output_matches_dense(alias, batch):
    """sparse_output=True must express the same pooled graph as the dense
    twin (block-diagonal sparse vs [B,K,K] dense)."""
    _, params, out_d = _run(alias, batch, k=4)
    p_s = get_pooler(alias, in_channels=6, k=4, sparse_output=True)
    out_s = p_s.apply(params, batch)
    assert out_s.graph is not None and out_s.dense is None
    g = out_s.graph
    # round-trip: densify the sparse output and compare adjacencies
    dense_rt = to_dense(g)
    adj_d = np.asarray(out_d.dense.adj)
    adj_s = np.asarray(dense_rt.adj)
    np.testing.assert_allclose(adj_s, adj_d, rtol=1e-4, atol=1e-5,
                               err_msg=alias)
    np.testing.assert_allclose(np.asarray(dense_rt.x),
                               np.asarray(out_d.dense.x), rtol=1e-4,
                               atol=1e-5)
    # losses unchanged by the output format
    for name in out_d.loss:
        np.testing.assert_allclose(float(out_s.loss[name]),
                                   float(out_d.loss[name]), rtol=1e-5)


@pytest.mark.parametrize("alias", ["mincut", "dmon"])
def test_adj_transpose(alias):
    """adj_transpose pre-transposes the densified adjacency (reference
    tgp/src.py:442-443), so with a DIRECTED graph the pooled output is
    exactly (SᵀAS)ᵀ of the untransposed run."""
    from tgp_tpu.graph import from_graphs

    rng = np.random.default_rng(0)
    graphs = []
    for n in (9, 11):
        x = rng.normal(size=(n, 6)).astype(np.float32)
        s = rng.integers(0, n, 20)
        r = rng.integers(0, n, 20)
        keep = s != r  # directed, no symmetrization
        graphs.append((x, np.stack([s[keep], r[keep]]).astype(np.int64)))
    dbatch = from_graphs(graphs)

    pooler = get_pooler(alias, in_channels=6, k=4, degree_norm=False)
    params = pooler.init(jax.random.key(0), dbatch)
    out = pooler.apply(params, dbatch)
    p_t = get_pooler(alias, in_channels=6, k=4, degree_norm=False,
                     adj_transpose=True)
    out_t = p_t.apply(params, dbatch)
    adj, adj_t = np.asarray(out.dense.adj), np.asarray(out_t.dense.adj)
    assert not np.allclose(adj_t, adj)  # directed → genuinely different
    np.testing.assert_allclose(adj_t, adj.transpose(0, 2, 1), rtol=1e-4,
                               atol=1e-5, err_msg=alias)


@pytest.mark.parametrize("alias", DENSE)
def test_remove_self_loops_zeroes_diag(alias, batch):
    _, _, out = _run(alias, batch, k=4, remove_self_loops=True)
    adj = np.asarray(out.dense.adj)
    diag = adj[:, np.arange(adj.shape[1]), np.arange(adj.shape[1])]
    np.testing.assert_allclose(diag, 0.0, atol=1e-6, err_msg=alias)


def test_keep_self_loops(batch):
    _, _, out = _run("mincut", batch, k=4, remove_self_loops=False,
                     degree_norm=False)
    adj = np.asarray(out.dense.adj)
    diag = adj[:, np.arange(adj.shape[1]), np.arange(adj.shape[1])]
    assert np.abs(diag).max() > 0  # SᵀAS has mass on the diagonal


def test_edge_weight_norm_dense(batch):
    _, _, out = _run("mincut", batch, k=4, degree_norm=False,
                     edge_weight_norm=True)
    adj = np.asarray(out.dense.adj)
    assert np.abs(adj).max() <= 1.0 + 1e-5


# -------------------------------------------------------- pass-so caching
def test_pass_so_skips_selection(batch):
    """Passing a precomputed SelectOutput must reproduce the output exactly
    (the jit-idiom replacement for the reference's cache flags,
    src.py:10-14)."""
    pooler, params, out1 = _run("mincut", batch, k=4)
    out2 = pooler.apply(params, batch, so=out1.so)
    np.testing.assert_allclose(np.asarray(out2.dense.x),
                               np.asarray(out1.dense.x), rtol=1e-6)
    for name in out1.loss:
        np.testing.assert_allclose(float(out2.loss[name]),
                                   float(out1.loss[name]), rtol=1e-6)


def test_pass_so_sparse_pooler(batch):
    pooler, params, out1 = _run("topk", batch, ratio=0.5)
    out2 = pooler.apply(params, batch, so=out1.so)
    np.testing.assert_allclose(np.asarray(out2.graph.x),
                               np.asarray(out1.graph.x), rtol=1e-6)


# ------------------------------------------------------- connect_red_op
@pytest.mark.parametrize("op", ["sum", "mean", "max"])
def test_connect_reduce_ops(op, batch):
    _, _, out = _run("topk", batch, ratio=0.5, connect_red_op=op)
    g = out.graph
    w = np.asarray(g.edge_weight)[np.asarray(g.edge_mask)]
    assert np.isfinite(w).all(), op
    assert (np.abs(w) > 0).any(), op


def test_degree_norm_sparse(batch):
    """degree_norm on the sparse connect path: D^-1/2 (A) D^-1/2."""
    _, params, out_raw = _run("topk", batch, ratio=0.8)
    p_n = get_pooler("topk", in_channels=6, ratio=0.8, degree_norm=True)
    out_n = p_n.apply(params, batch)
    w_raw = np.asarray(out_raw.graph.edge_weight)
    w_n = np.asarray(out_n.graph.edge_weight)
    em = np.asarray(out_n.graph.edge_mask)
    assert not np.allclose(w_n[em], w_raw[em])
    assert np.isfinite(w_n[em]).all()


# -------------------------------------------------------------- s_inv_op
@pytest.mark.parametrize("alias", ["mincut", "diff"])
@pytest.mark.parametrize("s_inv_op", ["transpose", "inverse"])
def test_lift_s_inv_ops(alias, s_inv_op, batch):
    pooler = get_pooler(alias, in_channels=6, k=4, s_inv_op=s_inv_op)
    params = pooler.init(jax.random.key(0), batch)
    out = pooler.apply(params, batch)
    x_lift = pooler.apply(params, batch, lifting=True, so=out.so,
                          x=out.dense.x)
    assert x_lift.shape[-1] == out.dense.x.shape[-1]
    assert np.isfinite(np.asarray(x_lift)).all()


def test_lift_inverse_differs_from_transpose(batch):
    """s_inv_op lives on the SelectOutput (set by the selector), so each
    pooler's own forward must produce a different lift."""
    pooler_t = get_pooler("mincut", in_channels=6, k=4, s_inv_op="transpose")
    pooler_i = get_pooler("mincut", in_channels=6, k=4, s_inv_op="inverse")
    params = pooler_t.init(jax.random.key(0), batch)
    out_t = pooler_t.apply(params, batch)
    out_i = pooler_i.apply(params, batch)
    # same S either way (s_inv_op doesn't change selection) …
    np.testing.assert_allclose(np.asarray(out_t.dense.x),
                               np.asarray(out_i.dense.x), rtol=1e-5)
    lift_t = pooler_t.apply(params, batch, lifting=True, so=out_t.so,
                            x=out_t.dense.x)
    lift_i = pooler_i.apply(params, batch, lifting=True, so=out_i.so,
                            x=out_i.dense.x)
    # … but the lift operator differs (Sᵀ vs S⁺)
    assert not np.allclose(np.asarray(lift_t), np.asarray(lift_i))


@pytest.mark.parametrize("batched", [True, False])
@pytest.mark.parametrize("adj_transpose", [True, False])
@pytest.mark.parametrize("sparse_output", [True, False])
def test_dense_flag_combination_lattice(batched, adj_transpose,
                                        sparse_output):
    """All 8 {batched}×{adj_transpose}×{sparse_output} combinations must
    produce the SAME aux losses on a symmetric adjacency (transposing a
    symmetric A is a no-op; sparse_output only re-encodes the pooled
    graph) — pairwise flag interactions the per-flag tests can't see.
    (Unweighted batch: the weighted fixture draws per-direction weights,
    making A asymmetric — there adj_transpose legitimately changes the
    cut, matching the reference's transpose semantics.)"""
    sym = make_batch([9, 6, 12], num_features=6, seed=3, weighted=False,
                     pad_nodes=32, pad_edges=160)
    pooler = get_pooler("mincut", in_channels=6, k=4, batched=batched,
                        adj_transpose=adj_transpose,
                        sparse_output=sparse_output)
    params = pooler.init(jax.random.key(0), sym)
    out = pooler.apply(params, sym)
    ref = get_pooler("mincut", in_channels=6, k=4).apply(params, sym)
    for name in ref.loss:
        np.testing.assert_allclose(
            float(out.loss[name]), float(ref.loss[name]), rtol=5e-4,
            atol=5e-4,
            err_msg=f"{batched=} {adj_transpose=} {sparse_output=} {name}")
    g = out.graph if out.graph is not None else out.dense
    x = g.x
    assert np.isfinite(np.asarray(x)).all()


# --------------------------------------------------------------- PAN knobs
def test_pan_pass_so_skips_selection(batch):
    """so= given: PANPooling reuses the cached selection (select/connect
    caching contract, SURVEY §2.1)."""
    pooler, params, out = _run("pan", batch)
    out2 = pooler.apply(params, batch, so=out.so)
    np.testing.assert_array_equal(np.asarray(out.so.node_sel_mask),
                                  np.asarray(out2.so.node_sel_mask))
    np.testing.assert_allclose(np.asarray(out.x), np.asarray(out2.x),
                               rtol=1e-6)


def test_pan_met_degree_override_changes_scores(batch):
    """met_degree explicitly given replaces the edge-weight degree term."""
    pooler, params, out = _run("pan", batch)
    huge = jnp.where(batch.node_mask,
                     jnp.arange(batch.num_nodes, dtype=jnp.float32), 0.0)
    out2 = pooler.apply(params, batch, met_degree=huge)
    assert not np.array_equal(np.asarray(out.so.node_sel_mask),
                              np.asarray(out2.so.node_sel_mask))


def test_pan_lifting_mode(batch):
    """lifting=True lifts pooled features back to node space (reference
    PANPooling lifting mode, tgp/poolers/pan.py)."""
    pooler, params, out = _run("pan", batch)
    lifted = pooler.apply(params, batch, so=out.so, x=out.x, lifting=True)
    assert lifted.shape[0] == batch.num_nodes
    assert np.isfinite(np.asarray(lifted)).all()


def test_pan_lifting_default_x(batch):
    """lifting=True with x=None lifts batch.x (the x-is-None branch) —
    shape contract only (the reduce is not an involution)."""
    pooler, params, out = _run("pan", batch)
    lifted = pooler.apply(params, batch, so=out.so, lifting=True)
    assert lifted.shape == (batch.num_nodes, batch.num_features)
