"""Connect operator unit tests (reference: tests/connect/test_*.py —
subgraph vs relabel+coalesce, coalesce reductions, postprocess flags,
SᵀAS oracle)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.utils_graphs import make_batch
from tgp_tpu.connect.base import (
    ConnectConfig,
    dense_connect,
    dense_connect_unbatched,
    sparse_connect,
)
from tgp_tpu.ops.sparse import coalesce, postprocess_adj_sparse


@pytest.fixture(scope="module")
def batch():
    return make_batch([8, 6], num_features=4, seed=41, weighted=True)


# ----------------------------------------------------------------- coalesce
@pytest.mark.parametrize("reduce", ["sum", "mean", "max"])
def test_coalesce_reductions(reduce):
    s = jnp.asarray([0, 0, 1, 1, 1, 2], jnp.int32)
    r = jnp.asarray([1, 1, 2, 2, 2, 0], jnp.int32)
    w = jnp.asarray([1.0, 2.0, 3.0, 4.0, 5.0, 6.0])
    em = jnp.ones(6, bool)
    s2, r2, w2, m2 = coalesce(s, r, w, em, 3, reduce=reduce)
    got = {}
    for e in np.nonzero(np.asarray(m2))[0]:
        got[(int(s2[e]), int(r2[e]))] = float(w2[e])
    want = {"sum": {(0, 1): 3.0, (1, 2): 12.0, (2, 0): 6.0},
            "mean": {(0, 1): 1.5, (1, 2): 4.0, (2, 0): 6.0},
            "max": {(0, 1): 2.0, (1, 2): 5.0, (2, 0): 6.0}}[reduce]
    assert got.keys() == want.keys()
    for k in want:
        np.testing.assert_allclose(got[k], want[k], rtol=1e-6, err_msg=str(k))


def test_coalesce_respects_mask():
    s = jnp.asarray([0, 0, 1], jnp.int32)
    r = jnp.asarray([1, 1, 0], jnp.int32)
    w = jnp.asarray([1.0, 99.0, 2.0])
    em = jnp.asarray([True, False, True])  # the 99 edge is padding
    s2, r2, w2, m2 = coalesce(s, r, w, em, 2)
    vals = {(int(s2[e]), int(r2[e])): float(w2[e])
            for e in np.nonzero(np.asarray(m2))[0]}
    assert vals == {(0, 1): 1.0, (1, 0): 2.0}


# --------------------------------------------------------- sparse postprocess
def test_postprocess_sparse_degree_norm(batch):
    s, r = batch.senders, batch.receivers
    w, em = batch.edge_weight, batch.edge_mask
    s2, r2, w2, m2 = postprocess_adj_sparse(
        s, r, w, em, batch.node_graph, batch.num_nodes, batch.num_graphs,
        remove_self_loops_flag=False, degree_norm=True)
    # oracle: D^-1/2 A D^-1/2
    N = batch.num_nodes
    A = np.zeros((N, N))
    sn, rn, wn, mn = map(np.asarray, (s, r, w, em))
    for e in np.nonzero(mn)[0]:
        A[sn[e], rn[e]] += wn[e]
    d = A.sum(1)
    dinv = np.where(d > 0, 1.0 / np.sqrt(np.maximum(d, 1e-12)), 0.0)
    for e in np.nonzero(np.asarray(m2))[0]:
        i, j = int(s2[e]), int(r2[e])
        np.testing.assert_allclose(float(w2[e]), dinv[i] * A[i, j] * dinv[j],
                                   rtol=1e-4, atol=1e-6)


def test_postprocess_sparse_prune_eps(batch):
    s, r = batch.senders, batch.receivers
    w, em = batch.edge_weight, batch.edge_mask
    s2, r2, w2, m2 = postprocess_adj_sparse(
        s, r, w, em, batch.node_graph, batch.num_nodes, batch.num_graphs,
        remove_self_loops_flag=False, prune_eps=1.0)
    kept = np.asarray(w2)[np.asarray(m2)]
    assert (np.abs(kept) >= 1.0).all()


# -------------------------------------------------------------- dense SᵀAS
def test_dense_connect_oracle():
    rng = np.random.default_rng(0)
    A = rng.random((2, 6, 6)).astype(np.float32)
    S = rng.random((2, 6, 3)).astype(np.float32)
    got = np.asarray(dense_connect(jnp.asarray(A), jnp.asarray(S)))
    want = np.einsum("bnk,bnm,bmj->bkj", S, A, S)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_dense_connect_unbatched_matches_batched(batch):
    """The SpMM twin of SᵀAS agrees with the dense batched path."""
    from tgp_tpu.graph import to_dense

    rng = np.random.default_rng(1)
    N = batch.num_nodes
    K = 3
    S = jnp.asarray(rng.random((N, K)).astype(np.float32))
    S = S * batch.node_mask[:, None]
    got = np.asarray(dense_connect_unbatched(
        batch.senders, batch.receivers, batch.edge_weight, S,
        batch.node_graph, batch.num_graphs, batch.node_mask))

    d = to_dense(batch)
    ng, npos, nm = (np.asarray(batch.node_graph), np.asarray(batch.node_pos),
                    np.asarray(batch.node_mask))
    Sd = np.zeros((2, d.adj.shape[1], K), np.float32)
    Sn = np.asarray(S)
    for i in np.nonzero(nm)[0]:
        Sd[ng[i], npos[i]] = Sn[i]
    want = np.einsum("bnk,bnm,bmj->bkj", Sd, np.asarray(d.adj), Sd)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------- sparse_connect
def test_sparse_connect_subgraph_oracle(batch):
    """Partial (top-k-style) connect keeps exactly the edges among selected
    nodes, relabeled to supernode ids (reference subgraph path,
    base_conn.py:57-112)."""
    from tgp_tpu.poolers import get_pooler

    pooler = get_pooler("topk", in_channels=4, ratio=0.6)
    params = pooler.init(jax.random.key(0), batch)
    so = pooler.apply(params, batch).so

    s2, r2, w2, m2 = sparse_connect(batch.senders, batch.receivers,
                                    batch.edge_weight, batch.edge_mask, so,
                                    ConnectConfig(remove_self_loops=False))
    sel = np.asarray(so.node_sel_mask)
    ci = np.asarray(so.cluster_index)
    sn, rn = np.asarray(batch.senders), np.asarray(batch.receivers)
    wn, mn = np.asarray(batch.edge_weight), np.asarray(batch.edge_mask)
    want = {}
    for e in np.nonzero(mn)[0]:
        if sel[sn[e]] and sel[rn[e]]:
            k = (ci[sn[e]], ci[rn[e]])
            want[k] = want.get(k, 0.0) + wn[e]
    got = {}
    for e in np.nonzero(np.asarray(m2))[0]:
        k = (int(s2[e]), int(r2[e]))
        got[k] = got.get(k, 0.0) + float(w2[e])
    assert got.keys() == want.keys()
    for k in want:
        np.testing.assert_allclose(got[k], want[k], rtol=1e-4,
                                   err_msg=str(k))


def test_postprocess_dense_self_loop_only_graph():
    """Adjacency that is ONLY self-loops: removal leaves all-zero, and
    degree norm must not divide by zero (reference
    test_dense_connect_unbatched_degree_norm_empty_after_remove_self_loops)."""
    from tgp_tpu.ops.sparse import postprocess_adj_dense

    adj = jnp.eye(4)[None] * 2.0
    out = postprocess_adj_dense(adj, remove_self_loops_flag=True,
                                degree_norm=True, edge_weight_norm=False,
                                adj_transpose=False)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out), 0.0)
    # edge_weight_norm over an all-zero adjacency is also finite
    out2 = postprocess_adj_dense(jnp.zeros((1, 4, 4)),
                                 remove_self_loops_flag=False,
                                 degree_norm=False, edge_weight_norm=True,
                                 adj_transpose=False)
    assert np.isfinite(np.asarray(out2)).all()


def test_postprocess_sparse_self_loop_only_graph():
    from tgp_tpu.ops.sparse import postprocess_adj_sparse

    s = jnp.asarray([0, 1, 2])
    r = jnp.asarray([0, 1, 2])
    w = jnp.asarray([1.0, 2.0, 3.0])
    em = jnp.ones(3, bool)
    ng = jnp.zeros(3, jnp.int32)
    s2, r2, w2, m2 = postprocess_adj_sparse(
        s, r, w, em, ng, 3, 1, remove_self_loops_flag=True,
        degree_norm=True, edge_weight_norm=True)
    assert not np.asarray(m2).any()          # nothing survives
    assert np.isfinite(np.asarray(w2)).all()  # and nothing is NaN/inf
    # prune_eps larger than every weight masks everything, finitely
    _, _, w3, m3 = postprocess_adj_sparse(
        s, r, w, em, ng, 3, 1, remove_self_loops_flag=False,
        degree_norm=False, edge_weight_norm=False, prune_eps=10.0)
    assert not np.asarray(m3).any()
    assert np.isfinite(np.asarray(w3)).all()
