"""TopkPooling end-to-end contract tests (analogue of the reference's
tests/test_poolers.py shape invariants + tests/poolers/test_topk.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from tgp_tpu.poolers import get_pooler
from tests.utils_graphs import make_batch


def _run_topk(batch, ratio=0.5, **kw):
    pooler = get_pooler("topk", in_channels=batch.num_features, ratio=ratio, **kw)
    params = pooler.init(jax.random.key(0), batch)
    out = pooler.apply(params, batch)
    return pooler, params, out


def test_topk_shapes_and_counts(small_batch):
    b = small_batch
    pooler, params, out = _run_topk(b, ratio=0.5)
    g = out.graph
    # per-graph kept counts = ceil(0.5 * n_g)
    n_g = np.asarray(b.nodes_per_graph())
    expect_k = np.ceil(0.5 * n_g).astype(int)
    kept = np.asarray(
        jax.ops.segment_sum(
            out.so.node_sel_mask.astype(jnp.int32), b.node_graph,
            num_segments=b.num_graphs)
    )
    np.testing.assert_array_equal(kept, expect_k)
    # pooled node mask counts match
    pooled_counts = np.asarray(g.nodes_per_graph())
    np.testing.assert_array_equal(pooled_counts, expect_k)
    # pooled edges only connect valid supernodes of the same graph
    em = np.asarray(g.edge_mask)
    s, r = np.asarray(g.senders), np.asarray(g.receivers)
    ng = np.asarray(g.node_graph)
    nm = np.asarray(g.node_mask)
    for e in np.nonzero(em)[0]:
        assert nm[s[e]] and nm[r[e]]
        assert ng[s[e]] == ng[r[e]]


def test_topk_scores_weight_features(small_batch):
    b = small_batch
    pooler, params, out = _run_topk(b, ratio=0.5)
    # pooled features = score * original features for the kept nodes
    sel = np.asarray(out.so.node_sel_mask)
    ci = np.asarray(out.so.cluster_index)
    w = np.asarray(out.so.weight)
    x = np.asarray(b.x)
    xp = np.asarray(out.graph.x)
    for i in np.nonzero(sel)[0]:
        np.testing.assert_allclose(xp[ci[i]], w[i] * x[i], rtol=1e-5, atol=1e-6)


def test_topk_subgraph_connect(small_batch):
    b = small_batch
    pooler, params, out = _run_topk(b, ratio=0.7, remove_self_loops=True)
    # oracle: dense A restricted to kept nodes
    sel = np.asarray(out.so.node_sel_mask)
    ci = np.asarray(out.so.cluster_index)
    N = b.num_nodes
    A = np.zeros((N, N), np.float32)
    s, r = np.asarray(b.senders), np.asarray(b.receivers)
    w, em = np.asarray(b.edge_weight), np.asarray(b.edge_mask)
    for e in np.nonzero(em)[0]:
        A[s[e], r[e]] += w[e]
    C = out.so.num_clusters
    A_exp = np.zeros((C, C), np.float32)
    for i in np.nonzero(sel)[0]:
        for j in np.nonzero(sel)[0]:
            if i != j and A[i, j] != 0:
                A_exp[ci[i], ci[j]] += A[i, j]
    g = out.graph
    A_got = np.zeros((C, C), np.float32)
    gs, gr = np.asarray(g.senders), np.asarray(g.receivers)
    gw, gm = np.asarray(g.edge_weight), np.asarray(g.edge_mask)
    for e in np.nonzero(gm)[0]:
        A_got[gs[e], gr[e]] += gw[e]
    np.testing.assert_allclose(A_got, A_exp, rtol=1e-5, atol=1e-6)


def test_topk_lift_roundtrip(small_batch):
    b = small_batch
    pooler, params, out = _run_topk(b, ratio=0.5)
    x_lift = pooler.apply(params, b, so=out.so, lifting=True, x=out.graph.x)
    assert x_lift.shape == b.x.shape
    # lifted features are nonzero only on selected nodes
    sel = np.asarray(out.so.node_sel_mask)
    xl = np.asarray(x_lift)
    assert np.allclose(xl[~sel], 0.0)
    ci = np.asarray(out.so.cluster_index)
    w = np.asarray(out.so.weight)
    xp = np.asarray(out.graph.x)
    for i in np.nonzero(sel)[0]:
        np.testing.assert_allclose(xl[i], w[i] * xp[ci[i]], rtol=1e-5, atol=1e-6)


def test_topk_jit_and_grad(small_batch):
    b = small_batch
    pooler = get_pooler("topk", in_channels=b.num_features, ratio=0.5)
    params = pooler.init(jax.random.key(0), b)

    @jax.jit
    def loss_fn(p, batch):
        out = pooler.apply(p, batch)
        return jnp.sum(out.graph.x ** 2)

    g = jax.grad(loss_fn)(params, b)
    leaf = jax.tree_util.tree_leaves(g)
    assert any(bool(jnp.any(l != 0)) for l in leaf)


def test_topk_min_score(small_batch):
    b = small_batch
    pooler = get_pooler("topk", in_channels=b.num_features, min_score=0.05)
    params = pooler.init(jax.random.key(1), b)
    out = pooler.apply(params, b)
    # all kept nodes have softmax score > min_score
    sel = np.asarray(out.so.node_sel_mask)
    w = np.asarray(out.so.weight)
    assert np.all(w[sel] > 0.05)


def test_topk_precomputed_score_branches(small_batch):
    """in_channels=None: the node features ARE the scores — both the
    [N, F] (first column) and flat [N] layouts (reference
    topk_select.py precomputed-score mode)."""
    from tgp_tpu.select.topk import TopkSelect

    b = small_batch
    sel = TopkSelect(in_channels=None, ratio=0.5, act=None)
    params = sel.init(jax.random.key(0), b)
    so_2d = sel.apply(params, b)

    flat = b.replace(x=b.x[:, 0])
    so_1d = sel.apply(params, flat)
    np.testing.assert_array_equal(np.asarray(so_2d.node_sel_mask),
                                  np.asarray(so_1d.node_sel_mask))


def test_topk_budget_int_and_float():
    from tgp_tpu.select.topk import topk_budget

    assert topk_budget(3, 10) == 3
    assert topk_budget(30, 10) == 10  # clamps to max_nodes
    assert topk_budget(0.25, 10) == 3  # ceil
    assert topk_budget(0.01, 10) == 1  # floor of 1


def test_topk_from_scores_extras_passthrough(small_batch):
    from tgp_tpu.select.topk import topk_select_from_scores

    b = small_batch
    scores = jnp.where(b.node_mask, 1.0, 0.0)
    so = topk_select_from_scores(scores, b, 0.5, None, "transpose",
                                 extras={"tag": jnp.ones(1)})
    assert "tag" in so.extras
    so2 = topk_select_from_scores(scores, b, 0.5, None, "transpose")
    assert so2.extras == {}
