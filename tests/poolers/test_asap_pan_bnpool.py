"""Contract tests for ASAP, PAN, BNPool + GTVConv/PANConv MP layers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tgp_tpu.graph import to_dense
from tgp_tpu.mp.gtvconv import GTVConv
from tgp_tpu.mp.pan import PANConv
from tgp_tpu.poolers import get_pooler
from tests.utils_graphs import make_batch


@pytest.fixture(scope="module")
def batch():
    return make_batch([8, 5, 11], num_features=6, seed=9, weighted=True,
                      pad_nodes=32, pad_edges=160)


def test_asap_contract(batch):
    pooler = get_pooler("asap", in_channels=6, ratio=0.5)
    params = pooler.init(jax.random.key(0), batch)
    out = pooler.apply(params, batch)
    counts = np.asarray(out.graph.nodes_per_graph())
    expect = np.ceil(0.5 * np.asarray(batch.nodes_per_graph())).astype(int)
    np.testing.assert_array_equal(counts, expect)
    assert np.isfinite(np.asarray(out.graph.x)).all()
    # gradient flows through attention
    def loss(p):
        o = pooler.apply(p, batch)
        return jnp.sum(o.graph.x ** 2)
    g = jax.grad(loss)(params)
    assert any(bool(jnp.any(l != 0)) for l in jax.tree_util.tree_leaves(g))


def test_panconv_and_pan_pooler(batch):
    conv = PANConv(out_channels=12, filter_size=3)
    cparams = conv.init(jax.random.key(0), batch)
    x_out, met_deg, met_w = conv.apply(cparams, batch)
    assert x_out.shape == (batch.num_nodes, 12)
    assert np.isfinite(np.asarray(x_out)).all()
    assert np.all(np.asarray(met_deg)[~np.asarray(batch.node_mask)] == 0)

    met_batch = batch.replace(x=x_out, edge_weight=met_w)
    pooler = get_pooler("pan", in_channels=12, ratio=0.5)
    params = pooler.init(jax.random.key(1), met_batch, met_degree=met_deg)
    out = pooler.apply(params, met_batch, met_degree=met_deg)
    counts = np.asarray(out.graph.nodes_per_graph())
    expect = np.ceil(0.5 * np.asarray(batch.nodes_per_graph())).astype(int)
    np.testing.assert_array_equal(counts, expect)


def test_gtvconv_sparse_dense_agree(batch):
    conv = GTVConv(out_channels=8, act=None)
    params = conv.init(jax.random.key(0), batch)
    out_sparse = conv.apply(params, batch)
    d = to_dense(batch)
    out_dense = conv.apply(params, d)
    # compare valid positions
    ng, pos, nm = (np.asarray(batch.node_graph), np.asarray(batch.node_pos),
                   np.asarray(batch.node_mask))
    os, od = np.asarray(out_sparse), np.asarray(out_dense)
    for i in np.nonzero(nm)[0]:
        np.testing.assert_allclose(os[i], od[ng[i], pos[i]], rtol=1e-4,
                                   atol=1e-4)


@pytest.mark.parametrize("batched", [True, False])
def test_bnpool_contract(batch, batched):
    pooler = get_pooler("bnpool", in_channels=6, k=4, batched=batched)
    rngs = {"params": jax.random.key(0), "sample": jax.random.key(1)}
    params = pooler.init(rngs, batch)
    out = pooler.apply(params, batch, rngs={"sample": jax.random.key(2)})
    assert set(out.loss) == {"quality", "kl", "K_prior"}
    for name, v in out.loss.items():
        assert np.isfinite(float(v)), name
    assert out.dense.x.shape == (3, 4, 6)
    # S rows on valid nodes sum to ~1 (stick-breaking simplex)
    s = np.asarray(out.so.s)
    if batched:
        m = np.asarray(out.so.in_mask)
        sums = s.sum(-1)[m]
    else:
        sums = s.sum(-1)[np.asarray(batch.node_mask)]
    np.testing.assert_allclose(sums, 1.0, atol=1e-4)


def test_bnpool_grad(batch):
    pooler = get_pooler("bnpool", in_channels=6, k=4)
    rngs = {"params": jax.random.key(0), "sample": jax.random.key(1)}
    params = pooler.init(rngs, batch)

    def loss(p):
        out = pooler.apply(p, batch, rngs={"sample": jax.random.key(3)})
        return out.loss_sum()

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(bool(jnp.any(l != 0)) for l in leaves)


def _met_oracle(batch, w, normalize, L=3):
    """NumPy oracle: M = Σ_{l=0}^{L} w_l A^l (+ optional D^-1/2 M D^-1/2)."""
    d = to_dense(batch)
    A = np.asarray(d.adj)
    mask = np.asarray(d.mask)
    M = np.asarray(w[0]) * np.eye(A.shape[-1])[None] * mask[:, :, None]
    cur = None
    for l in range(1, L + 1):
        cur = A if cur is None else np.einsum("bij,bjk->bik", cur, A)
        M = M + np.asarray(w[l]) * cur
    if normalize:
        deg = M.sum(-1)
        dinv = np.where(deg > 0, 1.0 / np.sqrt(np.clip(deg, 1e-12, None)),
                        0.0) * mask
        M = dinv[:, :, None] * M * dinv[:, None, :]
    return M


def test_panconv_exact_met_support(batch):
    conv = PANConv(out_channels=8, filter_size=3, exact_met_support=True,
                   normalize=False)
    params = conv.init(jax.random.key(0), batch)
    x_out, met_deg, met_w = conv.apply(params, batch)
    M = _met_oracle(batch, params["params"]["hop_weight"], normalize=False)
    eg = np.asarray(batch.edge_graph)
    sp = np.asarray(batch.node_pos)[np.asarray(batch.senders)]
    rp = np.asarray(batch.node_pos)[np.asarray(batch.receivers)]
    em = np.asarray(batch.edge_mask)
    got = np.asarray(met_w)
    for e in np.nonzero(em)[0]:
        np.testing.assert_allclose(got[e], M[eg[e], sp[e], rp[e]], rtol=1e-4,
                                   atol=1e-5)


def test_panconv_normalized_met(batch):
    """normalize=True (PyG PANConv semantics): met_degree == column sums of
    D^-1/2 M D^-1/2, met_edge_weight == the normalized entries."""
    conv = PANConv(out_channels=8, filter_size=3, normalize=True,
                   exact_met_support=True)
    params = conv.init(jax.random.key(0), batch)
    x_out, met_deg, met_w = conv.apply(params, batch)
    Mn = _met_oracle(batch, params["params"]["hop_weight"], normalize=True)
    ng = np.asarray(batch.node_graph)
    npos = np.asarray(batch.node_pos)
    nm = np.asarray(batch.node_mask)
    col = Mn.sum(-2)
    np.testing.assert_allclose(np.asarray(met_deg)[nm], col[ng[nm], npos[nm]],
                               rtol=1e-4, atol=1e-5)
    eg = np.asarray(batch.edge_graph)
    em = np.asarray(batch.edge_mask)
    got = np.asarray(met_w)
    sp, rp = npos[np.asarray(batch.senders)], npos[np.asarray(batch.receivers)]
    for e in np.nonzero(em)[0]:
        np.testing.assert_allclose(got[e], Mn[eg[e], sp[e], rp[e]],
                                   rtol=1e-4, atol=1e-5)


def test_pan_exact_dense_met_connect(batch):
    """The met_dense path pools the FULL MET matrix: pooled adjacency ==
    M[keep][:, keep] computed by a NumPy oracle (reference SpSpMM
    semantics, tgp/poolers/pan.py:190-204)."""
    from tgp_tpu.graph import to_dense
    from tgp_tpu.poolers import get_pooler

    conv = PANConv(out_channels=8, filter_size=3, return_dense_met=True)
    cp = conv.init(jax.random.key(0), batch)
    h, met_deg, met_w, met_dense = conv.apply(cp, batch)

    met_batch = batch.replace(x=h, edge_weight=met_w)
    pooler = get_pooler("pan", in_channels=8, ratio=0.5)
    pp = pooler.init(jax.random.key(1), met_batch, met_degree=met_deg,
                     met_dense=met_dense)
    out = pooler.apply(pp, met_batch, met_degree=met_deg,
                       met_dense=met_dense)

    # oracle: dense normalized M (incl. hop-0), subgraph on selected nodes
    M = _met_oracle(batch, cp["params"]["hop_weight"], normalize=True)
    so = out.so
    K = so.max_clusters
    sel = np.asarray(so.node_sel_mask)
    ng = np.asarray(so.node_graph)
    npos = np.asarray(batch.node_pos)
    slot = np.asarray(so.cluster_index) - ng * K

    g = out.graph
    adj_got = np.zeros((batch.num_graphs, K, K))
    sa, ra = np.asarray(g.senders), np.asarray(g.receivers)
    wa, ma = np.asarray(g.edge_weight), np.asarray(g.edge_mask)
    for e in np.nonzero(ma)[0]:
        b = sa[e] // K
        adj_got[b, sa[e] % K, ra[e] % K] += wa[e]

    adj_want = np.zeros_like(adj_got)
    for b in range(batch.num_graphs):
        idx = np.nonzero(sel & (ng == b))[0]
        for i in idx:
            for j in idx:
                adj_want[b, slot[i], slot[j]] = M[b, npos[i], npos[j]]
    np.testing.assert_allclose(adj_got, adj_want, rtol=1e-4, atol=1e-5)

    # met_degree from dense equals the iterated-SpMM degree plus hop-0
    deg_dense = M.sum(-2)
    got_deg = np.asarray(met_deg)
    nm = np.asarray(batch.node_mask)
    bg = np.asarray(batch.node_graph)
    np.testing.assert_allclose(got_deg[nm], deg_dense[bg[nm], npos[nm]],
                               rtol=1e-4, atol=1e-5)


def test_pan_restricted_vs_exact_support(batch):
    """Quantify the A∪I-support deviation: on the 1-hop support both paths
    agree exactly; the exact path additionally carries the ≥2-hop mass the
    restricted path drops (VERDICT weak #5)."""
    from tgp_tpu.graph import to_dense
    from tgp_tpu.poolers import get_pooler

    conv = PANConv(out_channels=8, filter_size=3, return_dense_met=True)
    cp = conv.init(jax.random.key(0), batch)
    h, met_deg, met_w, met_dense = conv.apply(cp, batch)
    met_batch = batch.replace(x=h, edge_weight=met_w)

    pooler = get_pooler("pan", in_channels=8, ratio=0.5)
    pp = pooler.init(jax.random.key(1), met_batch, met_degree=met_deg)
    out_r = pooler.apply(pp, met_batch, met_degree=met_deg)
    out_e = pooler.apply(pp, met_batch, met_degree=met_deg,
                         met_dense=met_dense)
    # same selection either way (identical scores)
    np.testing.assert_array_equal(np.asarray(out_r.so.node_sel_mask),
                                  np.asarray(out_e.so.node_sel_mask))

    def to_mat(g, K, B):
        m = np.zeros((B, K, K))
        s, r = np.asarray(g.senders), np.asarray(g.receivers)
        w, em = np.asarray(g.edge_weight), np.asarray(g.edge_mask)
        for e in np.nonzero(em)[0]:
            m[s[e] // K, s[e] % K, r[e] % K] += w[e]
        return m

    K = out_r.so.max_clusters
    mr = to_mat(out_r.graph, K, batch.num_graphs)
    me = to_mat(out_e.graph, K, batch.num_graphs)
    support = mr != 0
    # exact values agree wherever the restricted path kept an entry
    np.testing.assert_allclose(mr[support], me[support], rtol=1e-4,
                               atol=1e-5)
    # and the exact path carries strictly more mass (the dropped tail)
    assert np.abs(me[~support]).sum() > 0
