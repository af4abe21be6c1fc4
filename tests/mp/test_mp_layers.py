"""Behavioral tests for the message-passing layers (reference:
tests/mp/test_mp.py plus the per-layer semantics in
tgp/poolers/{asap,pan}.py and the PyG GCNConv/GraphConv/LEConv contracts).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.utils_graphs import make_batch
from tgp_tpu.graph import DenseGraphBatch, to_dense
from tgp_tpu.mp.gcn import GCNConv, GraphConv, gcn_norm
from tgp_tpu.mp.leconv import LEConv


@pytest.fixture(scope="module")
def batch():
    return make_batch([12, 9, 15], p=0.3, seed=7, num_features=8,
                      weighted=True)


def _np_gcn(x, ei_w, n, add_self_loops=True):
    """NumPy oracle for D^-1/2 (A+I) D^-1/2 X."""
    A = np.zeros((n, n))
    for s, r, w in ei_w:
        A[r, s] += w
    if add_self_loops:
        A = A + np.eye(n)
    d = np.clip(np.abs(A).sum(1), 1e-12, None)
    dinv = 1 / np.sqrt(d)
    return (dinv[:, None] * A * dinv[None, :]) @ x


def _edges(batch):
    s = np.asarray(batch.senders)
    r = np.asarray(batch.receivers)
    w = np.asarray(batch.edge_weight)
    m = np.asarray(batch.edge_mask)
    return [(s[e], r[e], w[e]) for e in np.nonzero(m)[0]]


def test_gcn_norm_matches_numpy(batch):
    s, r, w = gcn_norm(batch, add_self_loops=True)
    N = batch.num_nodes
    out = np.zeros((N, N))
    ss, rr, ww = np.asarray(s), np.asarray(r), np.asarray(w)
    for e in range(len(ss)):
        out[rr[e], ss[e]] += ww[e]
    x = np.asarray(batch.x)
    expect = _np_gcn(x, _edges(batch), N)
    nm = np.asarray(batch.node_mask)
    np.testing.assert_allclose((out @ x)[nm], expect[nm], rtol=1e-5,
                               atol=1e-5)


def test_gcnconv_sparse_vs_dense_paths():
    # Symmetric weights: the dense path computes ``adj @ x`` (PyG
    # DenseGCNConv convention — out-edge aggregation) while the sparse path
    # aggregates at receivers; like the reference, the two only coincide on
    # symmetric adjacencies, which is the dense poolers' operating regime.
    batch = make_batch([12, 9, 15], p=0.3, seed=7, num_features=8)
    conv = GCNConv(6)
    params = conv.init(jax.random.key(0), batch)
    out_sparse = conv.apply(params, batch)
    dense = to_dense(batch)
    out_dense = conv.apply(params, dense)
    nm = np.asarray(batch.node_mask)
    ng = np.asarray(batch.node_graph)[nm]
    npos = np.asarray(batch.node_pos)[nm]
    np.testing.assert_allclose(np.asarray(out_sparse)[nm],
                               np.asarray(out_dense)[ng, npos],
                               rtol=1e-4, atol=1e-4)


def test_gcnconv_no_bias_no_self_loops(batch):
    conv = GCNConv(6, use_bias=False, add_self_loops=False)
    params = conv.init(jax.random.key(0), batch)
    assert "bias" not in jax.tree_util.tree_flatten_with_path(params)[0].__repr__()
    out = conv.apply(params, batch)
    # padding rows must stay exactly zero without a bias to shift them
    nm = np.asarray(batch.node_mask)
    assert np.all(np.asarray(out)[~nm] == 0.0)


def test_gcnconv_padding_invariance(batch):
    """Growing the padding budget must not change valid-node outputs."""
    big = make_batch([12, 9, 15], p=0.3, seed=7, num_features=8,
                     weighted=True, pad_nodes=64, pad_edges=512)
    conv = GCNConv(6)
    params = conv.init(jax.random.key(0), batch)
    o1 = np.asarray(conv.apply(params, batch))
    o2 = np.asarray(conv.apply(params, big))
    nm1 = np.asarray(batch.node_mask)
    nm2 = np.asarray(big.node_mask)
    np.testing.assert_allclose(o1[nm1], o2[nm2], rtol=1e-5, atol=1e-5)


def test_graphconv_matches_manual(batch):
    conv = GraphConv(5)
    params = conv.init(jax.random.key(1), batch)
    out = np.asarray(conv.apply(params, batch))
    p = params["params"]
    x = np.asarray(batch.x)
    W_root = np.asarray(p["Dense_0"]["kernel"])
    b_root = np.asarray(p["Dense_0"]["bias"])
    W_nb = np.asarray(p["Dense_1"]["kernel"])
    N = batch.num_nodes
    agg = np.zeros_like(x)
    for s, r, w in _edges(batch):
        agg[r] += w * x[s]
    expect = x @ W_root + b_root + agg @ W_nb
    nm = np.asarray(batch.node_mask)
    np.testing.assert_allclose(out[nm], expect[nm], rtol=1e-4, atol=1e-4)


def test_graphconv_mean_aggr(batch):
    conv = GraphConv(5, aggr="mean")
    params = conv.init(jax.random.key(1), batch)
    out = np.asarray(conv.apply(params, batch))
    p = params["params"]
    x = np.asarray(batch.x)
    W_root = np.asarray(p["Dense_0"]["kernel"])
    b_root = np.asarray(p["Dense_0"]["bias"])
    W_nb = np.asarray(p["Dense_1"]["kernel"])
    agg = np.zeros_like(x)
    deg = np.zeros(x.shape[0])
    for s, r, w in _edges(batch):
        agg[r] += w * x[s]
        deg[r] += w
    agg = agg / np.clip(deg, 1.0, None)[:, None]
    expect = x @ W_root + b_root + agg @ W_nb
    nm = np.asarray(batch.node_mask)
    np.testing.assert_allclose(out[nm], expect[nm], rtol=1e-4, atol=1e-4)


def test_leconv_matches_manual(batch):
    conv = LEConv(4)
    params = conv.init(jax.random.key(2), batch.x, batch.senders,
                       batch.receivers, batch.edge_weight, batch.num_nodes,
                       batch.node_mask)
    out = np.asarray(conv.apply(params, batch.x, batch.senders,
                                batch.receivers, batch.edge_weight,
                                batch.num_nodes, batch.node_mask))
    p = params["params"]
    x = np.asarray(batch.x)
    a = x @ np.asarray(p["Dense_0"]["kernel"]) + np.asarray(
        p["Dense_0"]["bias"])
    b = x @ np.asarray(p["Dense_1"]["kernel"])
    root = x @ np.asarray(p["Dense_2"]["kernel"]) + np.asarray(
        p["Dense_2"]["bias"])
    agg = np.zeros_like(a)
    for s, r, w in _edges(batch):
        agg[r] += w * (a[s] - b[r])
    nm = np.asarray(batch.node_mask)
    np.testing.assert_allclose(out[nm], (root + agg)[nm], rtol=1e-4,
                               atol=1e-4)


def test_panconv_met_is_symmetric_and_normalized(batch):
    """The MET matrix M = Z^-1/2 (Σ_h A^h) Z^-1/2 must be symmetric for an
    undirected graph, with hop-0 (identity) included (reference:
    tgp/poolers/pan.py:190-194 — PANConv returns the normalized MET)."""
    from tgp_tpu.mp.pan import PANConv

    batch = make_batch([12, 9, 15], p=0.3, seed=7, num_features=8)
    conv = PANConv(8, filter_size=2, return_dense_met=True)
    params = conv.init(jax.random.key(3), batch)
    res = conv.apply(params, batch)
    met = np.asarray(res[-1])  # [B, Nmax, Nmax]
    nm = np.asarray(batch.node_mask)
    ng = np.asarray(batch.node_graph)
    npos = np.asarray(batch.node_pos)
    for g in range(batch.num_graphs):
        rows = npos[nm & (ng == g)]
        Mg = met[g][np.ix_(rows, rows)]
        np.testing.assert_allclose(Mg, Mg.T, rtol=1e-4, atol=1e-5)
        assert np.all(np.diag(Mg) > 0)  # hop-0 term present


def test_gcnconv_dense_pre_normalized_matches_manual():
    rng = np.random.default_rng(0)
    B, N, F = 2, 16, 4
    adj = rng.random((B, N, N)).astype(np.float32)
    adj = (adj + adj.transpose(0, 2, 1)) / 2
    mask = np.ones((B, N), bool)
    x = rng.normal(size=(B, N, F)).astype(np.float32)
    dense = DenseGraphBatch(x=jnp.asarray(x), adj=jnp.asarray(adj),
                            mask=jnp.asarray(mask))
    conv = GCNConv(4, normalize=False, use_bias=False)
    params = conv.init(jax.random.key(4), dense)
    out = np.asarray(conv.apply(params, dense))
    W = np.asarray(params["params"]["Dense_0"]["kernel"])
    expect = adj @ (x @ W)
    np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("delta", [0.5, 1.0, 2.0])
def test_gtvconv_matches_numpy_oracle(delta):
    """GTVConv dense path against a manual float64 transcription of
    act((I − δ·L_Γ)XW + b), Γ_ij = a_ij / max(|x_iW − x_jW|₁, ε)
    (reference gtvconv.py:43-170)."""
    from tgp_tpu.graph import from_graphs, to_dense
    from tgp_tpu.mp.gtvconv import GTVConv

    rng = np.random.default_rng(3)
    n = 7
    upper = np.triu(rng.random((n, n)) < 0.5, k=1)
    adj_np = (upper | upper.T).astype(np.float64)
    s, r = np.nonzero(adj_np)
    x_np = rng.normal(size=(n, 5)).astype(np.float32)
    b = from_graphs([(x_np, np.stack([s, r]))])
    d = to_dense(b)

    conv = GTVConv(out_channels=4, delta_coeff=delta, act=None)
    params = conv.init(jax.random.key(0), d)
    out = np.asarray(conv.apply(params, d))[0, :n]

    W = np.asarray(params["params"]["weight"], np.float64)
    bias = np.asarray(params["params"]["bias"], np.float64)
    h = x_np.astype(np.float64) @ W
    diff = np.abs(h[:, None, :] - h[None, :, :]).sum(-1)
    gamma = np.where(adj_np != 0, adj_np / np.clip(diff, 1e-3, None), 0.0)
    lap = np.diag(gamma.sum(1)) - gamma
    expect = (np.eye(n) - delta * lap) @ h + bias
    np.testing.assert_allclose(out, expect, rtol=2e-4, atol=2e-5)

    # sparse path agrees with the same oracle
    out_sp = np.asarray(conv.apply(params, b))[:n]
    np.testing.assert_allclose(out_sp, expect, rtol=2e-4, atol=2e-5)


def test_panconv_filter_size_changes_met(batch):
    """filter_size L sums MET hops 0..L: larger L adds longer-range mass."""
    from tgp_tpu.mp.pan import PANConv

    outs = {}
    for L in (1, 3):
        conv = PANConv(8, filter_size=L)
        params = conv.init(jax.random.key(0), batch)
        _, met_deg, met_w = conv.apply(params, batch)[:3]
        outs[L] = np.asarray(met_deg)
    assert not np.allclose(outs[1], outs[3])


def test_panconv_return_dense_met_shape_and_consistency(batch):
    """return_dense_met=True appends [B, Nmax, Nmax]; its edge-support
    gather equals met_edge_weight."""
    from tgp_tpu.mp.pan import PANConv

    conv = PANConv(8, return_dense_met=True)
    params = conv.init(jax.random.key(0), batch)
    x_out, met_deg, met_w, met_dense = conv.apply(params, batch)
    assert met_dense.shape == (batch.num_graphs, batch.max_nodes,
                               batch.max_nodes)
    md = np.asarray(met_dense)
    s = np.asarray(batch.senders)
    r = np.asarray(batch.receivers)
    em = np.asarray(batch.edge_mask)
    ng = np.asarray(batch.node_graph)
    pos = np.asarray(batch.node_pos)
    got = md[ng[s[em]], pos[s[em]], pos[r[em]]]
    np.testing.assert_allclose(got, np.asarray(met_w)[em], rtol=1e-4,
                               atol=1e-5)


def test_panconv_unnormalized_branch(batch):
    from tgp_tpu.mp.pan import PANConv

    conv_n = PANConv(8, normalize=True)
    conv_r = PANConv(8, normalize=False)
    params = conv_n.init(jax.random.key(0), batch)
    out_n = conv_n.apply(params, batch)[0]
    out_r = conv_r.apply(params, batch)[0]
    assert not np.allclose(np.asarray(out_n), np.asarray(out_r))


def test_gtvconv_delta_knob(batch):
    from tgp_tpu.mp.gtvconv import GTVConv

    base = GTVConv(8)
    params = base.init(jax.random.key(0), batch)
    out = base.apply(params, batch)
    out_d = GTVConv(8, delta_coeff=3.0).apply(params, batch)
    assert not np.allclose(np.asarray(out), np.asarray(out_d))


def test_gtvconv_eps_clamps_identical_features(batch):
    """eps only matters when |h_i − h_j| < eps: with identical node
    features the TV weights become w/eps, so eps rescales the output."""
    from tgp_tpu.mp.gtvconv import GTVConv

    flat = batch.replace(x=jnp.ones_like(batch.x))
    base = GTVConv(8, act=None)
    params = base.init(jax.random.key(0), flat)
    out1 = np.asarray(base.apply(params, flat))
    out2 = np.asarray(GTVConv(8, act=None, eps=0.5).apply(params, flat))
    assert not np.allclose(out1, out2)


def test_gtvconv_identity_activation(batch):
    from tgp_tpu.mp.gtvconv import GTVConv

    conv = GTVConv(8, act=None)
    params = conv.init(jax.random.key(0), batch)
    out = np.asarray(conv.apply(params, batch))
    # no relu: negatives survive
    assert (out < 0).any()


def test_leconv_reference_bias_placement(batch):
    """Reference-exact lin1/lin2/lin3 bias layout (oracle-found round-2
    fix): neighbor and root Dense carry biases, the self term does not."""
    from tgp_tpu.mp.leconv import LEConv

    conv = LEConv(8)
    params = conv.init(jax.random.key(0), batch.x, batch.senders,
                       batch.receivers, batch.edge_weight, batch.num_nodes)
    names = {jax.tree_util.keystr(k)
             for k, _ in jax.tree_util.tree_leaves_with_path(params)}
    biased = {n for n in names if "bias" in n}
    assert len(biased) == 2  # lin1 + lin3, not lin2
