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


def test_panconv_exact_met_support(batch):
    conv = PANConv(out_channels=8, filter_size=3, exact_met_support=True)
    params = conv.init(jax.random.key(0), batch)
    x_out, met_deg, met_w = conv.apply(params, batch)
    # oracle: dense powers per graph
    from tgp_tpu.graph import to_dense
    d = to_dense(batch)
    w = params["params"]["hop_weight"]
    A = np.asarray(d.adj)
    M = w[1] * A + w[2] * np.einsum("bij,bjk->bik", A, A)
    eg = np.asarray(batch.edge_graph)
    sp = np.asarray(batch.node_pos)[np.asarray(batch.senders)]
    rp = np.asarray(batch.node_pos)[np.asarray(batch.receivers)]
    em = np.asarray(batch.edge_mask)
    got = np.asarray(met_w)
    for e in np.nonzero(em)[0]:
        np.testing.assert_allclose(got[e], M[eg[e], sp[e], rp[e]], rtol=1e-4,
                                   atol=1e-5)
