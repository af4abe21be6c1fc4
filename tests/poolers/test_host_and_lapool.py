"""Contract tests for host-eager poolers (NDP/SEP/NMF/Eigen) and LaPool —
completing the 21-pooler matrix."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tgp_tpu.poolers import get_pooler, pooler_map
from tests.utils_graphs import make_batch

ALL_ALIASES = {
    "topk", "sag", "asap", "pan", "ec", "mincut", "diff", "dmon", "hosc",
    "jb", "acc", "bnpool", "lap", "maxcut", "kmis", "graclus", "ndp", "sep",
    "nmf", "eigen", "nopool",
}


@pytest.fixture(scope="module")
def batch():
    return make_batch([8, 5, 11], num_features=6, seed=9, weighted=True,
                      pad_nodes=32, pad_edges=160)


def test_full_registry():
    assert ALL_ALIASES <= set(pooler_map()), (
        ALL_ALIASES - set(pooler_map()))


@pytest.mark.parametrize("alias,kw", [
    ("ndp", {}),
    ("sep", {}),
    ("nmf", {"k": 4}),
    ("eigen", {"k": 3, "num_modes": 2}),
])
def test_host_pooler_contract(alias, kw, batch):
    pooler = get_pooler(alias, **kw)
    params = pooler.init(jax.random.key(0), batch)
    out = pooler.apply(params, batch)
    g = out.graph
    assert g is not None
    counts = np.asarray(g.nodes_per_graph())
    assert (counts >= 1).all()
    assert np.isfinite(np.asarray(g.x)).all()
    # edges stay within graphs
    em, s, r = map(np.asarray, (g.edge_mask, g.senders, g.receivers))
    ng, nm = np.asarray(g.node_graph), np.asarray(g.node_mask)
    for e in np.nonzero(em)[0]:
        assert nm[s[e]] and nm[r[e]]
        assert ng[s[e]] == ng[r[e]]


def test_ndp_lift(batch):
    pooler = get_pooler("ndp")
    out = pooler(batch)
    x_lift = pooler(batch, so=out.so, lifting=True, x=out.graph.x)
    assert x_lift.shape == batch.x.shape


def test_eigen_feature_expansion(batch):
    pooler = get_pooler("eigen", k=3, num_modes=2)
    out = pooler(batch)
    # feature dim expands to H*F (reference eigenpool.py:118-145)
    assert out.graph.x.shape[-1] == 2 * batch.num_features
    x_lift = pooler(batch, so=out.so, lifting=True,
                    x=out.graph.x[: 3 * out.so.num_clusters].reshape(
                        3, out.so.num_clusters, -1))
    assert x_lift.shape == batch.x.shape


def test_lapool_contract(batch):
    pooler = get_pooler("lap")
    params = pooler.init(jax.random.key(0), batch)
    out = pooler.apply(params, batch)
    assert out.dense is not None
    s = np.asarray(out.so.s)
    nm = np.asarray(batch.node_mask)
    # every valid node's assignment row sums to ~1
    np.testing.assert_allclose(s[nm].sum(-1), 1.0, atol=1e-4)
    # leaders exist in every graph
    leader = np.asarray(out.so.extras["leader"])
    ng = np.asarray(batch.node_graph)
    for g in range(batch.num_graphs):
        assert leader[(ng == g) & nm].sum() >= 1
    # pooled graph masks match leader counts
    om = np.asarray(out.dense.mask)
    for g in range(batch.num_graphs):
        assert om[g].sum() == leader[(ng == g) & nm].sum()


def test_lapool_jit(batch):
    pooler = get_pooler("lap")
    params = pooler.init(jax.random.key(0), batch)

    @jax.jit
    def fwd(b):
        return pooler.apply(params, b).dense.x

    out = fwd(batch)
    assert np.isfinite(np.asarray(out)).all()


def test_lapool_shortest_path_reg():
    # chain graphs → leader distances vary, so β = 1/d actually bites
    from tests.utils_graphs import chain_graph
    from tgp_tpu.graph import from_graphs

    graphs = [chain_graph(12, num_features=6, seed=i) for i in range(2)]
    b = from_graphs(graphs, pad_nodes=32, pad_edges=128)
    pooler = get_pooler("lap", shortest_path_reg=True)
    out = pooler(b)  # eager (host csgraph) path
    s = np.asarray(out.so.s)
    nm = np.asarray(b.node_mask)
    # β = 1/dist multiplies the softmax OUTPUT (reference semantics:
    # lapool_select.py ``s = beta * s``), so follower rows sum to ≤ 1 while
    # leader rows stay exactly one-hot
    sums = s[nm].sum(-1)
    assert (sums <= 1.0 + 1e-5).all() and (sums > 0).all()
    leader = np.asarray(out.so.extras["leader"])[np.asarray(b.node_mask)]
    np.testing.assert_allclose(sums[leader], 1.0, atol=1e-6)
    # regularization changes follower assignments vs the plain path
    out0 = get_pooler("lap")(b)
    assert not np.allclose(s, np.asarray(out0.so.s))
