"""Coverage for the Laplacian helpers, readout variants, sampling variants,
and host fallbacks (reference: tgp/utils/ops.py:1061-1149 delta-GCN,
tgp/utils/ops.py:636-859 negative sampling, tgp/reduce/global_reduce.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.utils_graphs import erdos_renyi_graph, make_batch
from tgp_tpu.ops.lap import (
    delta_gcn_matrix,
    laplacian,
    power_iteration_max_eigvec,
)
from tgp_tpu.ops.sampling import (
    bipartite_negative_edge_sampling,
    negative_edge_sampling,
)
from tgp_tpu.reduce.global_reduce import global_reduce


@pytest.fixture(scope="module")
def batch():
    return make_batch([10, 8], num_features=4, seed=3, weighted=True)


def _coo_to_dense(s, r, w, m, N):
    out = np.zeros((N, N))
    s, r, w, m = map(np.asarray, (s, r, w, m))
    for e in np.nonzero(m)[0]:
        out[s[e], r[e]] += w[e]
    return out


def _dense_adj(batch):
    N = batch.num_nodes
    return _coo_to_dense(batch.senders, batch.receivers, batch.edge_weight,
                         batch.edge_mask, N)


def test_laplacian_unnormalized(batch):
    N = batch.num_nodes
    s, r, lw, m = laplacian(batch.senders, batch.receivers,
                            batch.edge_weight, batch.edge_mask,
                            batch.node_mask, N)
    L = _coo_to_dense(s, r, lw, m, N)
    A = _dense_adj(batch)
    D = np.diag(A.sum(1))
    nm = np.asarray(batch.node_mask)
    np.testing.assert_allclose(L[nm][:, nm], (D - A)[nm][:, nm], rtol=1e-5,
                               atol=1e-6)


def test_laplacian_sym(batch):
    N = batch.num_nodes
    s, r, lw, m = laplacian(batch.senders, batch.receivers,
                            batch.edge_weight, batch.edge_mask,
                            batch.node_mask, N, normalization="sym")
    L = _coo_to_dense(s, r, lw, m, N)
    A = _dense_adj(batch)
    d = A.sum(1)
    dinv = np.where(d > 0, 1.0 / np.sqrt(np.maximum(d, 1e-12)), 0.0)
    Lo = np.diag((d > 0).astype(float)) - dinv[:, None] * A * dinv[None, :]
    nm = np.asarray(batch.node_mask)
    np.testing.assert_allclose(L[nm][:, nm], Lo[nm][:, nm], rtol=1e-5,
                               atol=1e-6)


@pytest.mark.parametrize("delta", [0.5, 2.0])
def test_delta_gcn_matrix(batch, delta):
    N = batch.num_nodes
    s, r, pw, m = delta_gcn_matrix(batch.senders, batch.receivers,
                                   batch.edge_weight, batch.edge_mask,
                                   batch.node_mask, N, delta=delta)
    Pm = _coo_to_dense(s, r, pw, m, N)
    A = _dense_adj(batch)
    d = A.sum(1)
    dinv = np.where(d > 0, 1.0 / np.sqrt(np.maximum(d, 1e-12)), 0.0)
    nm = np.asarray(batch.node_mask)
    Po = (1 - delta) * np.eye(N) + delta * dinv[:, None] * A * dinv[None, :]
    np.testing.assert_allclose(Pm[nm][:, nm], Po[nm][:, nm], rtol=1e-5,
                               atol=1e-6)


def test_delta_gcn_isolated_node_diag_one():
    """Isolated nodes get P diagonal 1 (L_sym diagonal 0)."""
    from tgp_tpu.graph import from_graphs

    x = np.random.default_rng(0).normal(size=(4, 3)).astype(np.float32)
    ei = np.array([[0, 1], [1, 0]])  # nodes 2, 3 isolated
    b = from_graphs([(x, ei)])
    s, r, pw, m = delta_gcn_matrix(b.senders, b.receivers, b.edge_weight,
                                   b.edge_mask, b.node_mask, b.num_nodes,
                                   delta=2.0)
    P = _coo_to_dense(s, r, pw, m, b.num_nodes)
    np.testing.assert_allclose(P[2, 2], 1.0)
    np.testing.assert_allclose(P[3, 3], 1.0)


def test_power_iteration_matches_numpy():
    x, ei = erdos_renyi_graph(12, p=0.4, seed=1)
    from tgp_tpu.graph import from_graphs

    b = from_graphs([(x, ei)])
    v = np.asarray(power_iteration_max_eigvec(
        b.senders, b.receivers, b.edge_weight, b.num_nodes, num_iters=300))
    A = _dense_adj(b)[:12, :12]
    evals, evecs = np.linalg.eigh(A)
    lead = evecs[:, np.argmax(np.abs(evals))]
    got = v[:12] / np.linalg.norm(v[:12])
    cos = abs(float(got @ lead))
    assert cos > 0.99


# ------------------------------------------------------------ global_reduce
def test_global_reduce_dense_ops():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 5, 3)).astype(np.float32))
    mask = jnp.asarray([[1, 1, 1, 0, 0], [1, 1, 1, 1, 1]], bool)
    xn = np.asarray(x)
    for op, ref in [("sum", lambda v: v.sum(0)),
                    ("mean", lambda v: v.mean(0)),
                    ("max", lambda v: v.max(0))]:
        out = np.asarray(global_reduce(x, mask=mask, op=op))
        for b in range(2):
            sel = np.asarray(mask[b])
            np.testing.assert_allclose(out[b], ref(xn[b][sel]), rtol=1e-5,
                                       err_msg=op)
    with pytest.raises(ValueError):
        global_reduce(x, mask=mask, op="median")


def test_global_reduce_sparse_ops(batch):
    xn = np.asarray(batch.x)
    ng = np.asarray(batch.node_graph)
    nm = np.asarray(batch.node_mask)
    for op, ref in [("sum", lambda v: v.sum(0)),
                    ("mean", lambda v: v.mean(0)),
                    ("max", lambda v: v.max(0))]:
        out = np.asarray(global_reduce(
            batch.x, node_graph=batch.node_graph, num_graphs=2,
            node_mask=batch.node_mask, op=op))
        for g in range(2):
            sel = nm & (ng == g)
            np.testing.assert_allclose(out[g], ref(xn[sel]), rtol=1e-4,
                                       atol=1e-5, err_msg=op)
    with pytest.raises(ValueError):
        global_reduce(batch.x, node_graph=batch.node_graph, num_graphs=2,
                      op="median")


# ----------------------------------------------------------------- sampling
def test_negative_sampling_force_undirected(batch):
    s, r, m = negative_edge_sampling(jax.random.key(0), batch,
                                     force_undirected=True)
    sn, rn, mn = map(np.asarray, (s, r, m))
    # no sampled pair may exist as an edge in EITHER direction
    real = set()
    bs, br = np.asarray(batch.senders), np.asarray(batch.receivers)
    for e in np.nonzero(np.asarray(batch.edge_mask))[0]:
        real.add((bs[e], br[e]))
    for e in np.nonzero(mn)[0]:
        assert (sn[e], rn[e]) not in real
        assert (rn[e], sn[e]) not in real
        assert sn[e] != rn[e]


def test_negative_sampling_more_rounds_fewer_failures(batch):
    _, _, m1 = negative_edge_sampling(jax.random.key(1), batch, num_rounds=1)
    _, _, m5 = negative_edge_sampling(jax.random.key(1), batch, num_rounds=5)
    assert int(m5.sum()) >= int(m1.sum())


def test_bipartite_negative_sampling():
    rng = np.random.default_rng(0)
    E, NS, ND = 64, 10, 12
    s = jnp.asarray(rng.integers(0, NS, E).astype(np.int32))
    r = jnp.asarray(rng.integers(0, ND, E).astype(np.int32))
    em = jnp.ones(E, bool)
    ns, nr, nm = bipartite_negative_edge_sampling(
        jax.random.key(0), s, r, em, NS, ND, num_samples=32)
    assert ns.shape == (32,)
    real = {(int(a), int(b)) for a, b in zip(np.asarray(s), np.asarray(r))}
    for e in np.nonzero(np.asarray(nm))[0]:
        assert (int(ns[e]), int(nr[e])) not in real
    assert int(np.asarray(ns).max()) < NS
    assert int(np.asarray(nr).max()) < ND


# ------------------------------------------------- host fallbacks / typing
def test_graclus_numpy_fallback_matches_native():
    from tgp_tpu.precoarsen.graclus import graclus_matching_numpy

    x, ei = erdos_renyi_graph(20, p=0.3, seed=2)
    w = np.random.default_rng(0).uniform(0.5, 2.0, ei.shape[1])
    w = w.astype(np.float32)
    cl = graclus_matching_numpy(ei, 20, w, seed=1)
    assert cl.shape == (20,)
    # consecutive cluster ids, each of size <= 2 (it is a matching)
    ids, counts = np.unique(cl, return_counts=True)
    np.testing.assert_array_equal(ids, np.arange(len(ids)))
    assert counts.max() <= 2
    # every 2-cluster is an actual edge
    edges = {(int(a), int(b)) for a, b in ei.T}
    for c in ids[counts == 2]:
        u, v = np.nonzero(cl == c)[0]
        assert (u, v) in edges or (v, u) in edges


def test_typing_aliases_importable():
    from tgp_tpu.utils.typing import (
        ConnectionType,
        LiftType,
        ReduceType,
        SinvType,
    )

    for t in (SinvType, LiftType, ConnectionType, ReduceType):
        assert t is not None


@pytest.mark.parametrize("largest", [True, False])
def test_lobpcg_matches_numpy(largest):
    """Blocked LOBPCG vs numpy.eigh on a small symmetric operator."""
    from tgp_tpu.graph import from_graphs
    from tgp_tpu.ops.lap import lobpcg

    x, ei = erdos_renyi_graph(24, p=0.3, seed=7)
    w = np.random.default_rng(0).uniform(0.5, 2.0, ei.shape[1])
    # symmetrize weights (undirected edge list has both directions)
    key = ei[0] * 24 + ei[1]
    keyT = ei[1] * 24 + ei[0]
    lut = dict(zip(key, w))
    w = np.array([(lut[a] + lut.get(b, lut[a])) / 2
                  for a, b in zip(key, keyT)], np.float32)
    b = from_graphs([(x, ei, w)])
    vals, vecs = lobpcg(b.senders, b.receivers, b.edge_weight, b.num_nodes,
                        k=3, num_iters=80, largest=largest)
    A = np.zeros((b.num_nodes, b.num_nodes))
    s, r = np.asarray(b.senders), np.asarray(b.receivers)
    em = np.asarray(b.edge_mask)
    A[s[em], r[em]] = np.asarray(b.edge_weight)[em]
    evals = np.linalg.eigvalsh(A[:24, :24])
    want = evals[-3:][::-1] if largest else evals[:3]
    np.testing.assert_allclose(np.asarray(vals)[:3], want, rtol=1e-3,
                               atol=1e-3)
    # eigvector residual ||Av - λv|| small
    v0 = np.asarray(vecs)[:24, 0]
    lam = float(vals[0])
    res = np.linalg.norm(A[:24, :24] @ v0 - lam * v0)
    assert res < 1e-2 * max(abs(lam), 1.0)


def test_ndp_level_lobpcg_solver():
    """ndp_level with the device LOBPCG solver produces a valid bipartition
    comparable to the scipy path."""
    from tgp_tpu.precoarsen.ndp import ndp_level

    x, ei = erdos_renyi_graph(48, p=0.15, seed=9)
    lvl_a = ndp_level(ei, 48, eigensolver="auto")
    lvl_b = ndp_level(ei, 48, eigensolver="lobpcg")
    for lvl in (lvl_a, lvl_b):
        ci = np.asarray(lvl["cluster_index"])
        k = lvl["num_clusters"]
        assert 0 < k < 48
        assert (ci[ci >= 0] < k).all()
    # same solver target → similar split sizes (eigvec sign ambiguity OK)
    ka, kb = lvl_a["num_clusters"], lvl_b["num_clusters"]
    assert min(ka, kb, 48 - ka, 48 - kb) > 0


def test_assign_all_nodes_random_fallback():
    """With a key, disconnected remainders get a uniformly random occupied
    supernode of their OWN graph (reference get_random_map_mask,
    tgp/utils/ops.py:1177-1219)."""
    from tgp_tpu.ops.assignment import assign_all_nodes
    from tgp_tpu.select.base import cluster_to_select_output
    from tgp_tpu.graph import from_graphs

    # two graphs; graph 0: nodes 0-3 with NO edges between 2,3 and the
    # seeds; seeds: node 0 -> cluster 0, node 1 -> cluster 1
    x = np.ones((8, 2), np.float32)
    ei = np.array([[0, 1, 4, 5], [1, 0, 5, 4]])
    b = from_graphs([(x[:4], ei[:, :2]), (x[4:], ei[:, 2:] - 4)])
    N = b.num_nodes
    ci = np.zeros(N, np.int64)
    sel = np.zeros(N, bool)
    # seeds: nodes 0,1 (graph 0) -> clusters 0,1; node 4 (graph 1) -> 4
    for n, c in ((0, 0), (1, 1), (4, 4)):
        ci[n], sel[n] = c, True
    so = cluster_to_select_output(
        jnp.asarray(ci), b, node_sel_mask=jnp.asarray(sel),
        num_clusters=N, max_clusters=b.max_nodes, partial=True)
    out = assign_all_nodes(so, b.senders, b.receivers, b.edge_mask,
                           max_iter=1, key=jax.random.key(0))
    ci2 = np.asarray(out.cluster_index)
    nm = np.asarray(b.node_mask)
    ng = np.asarray(b.node_graph)
    assert np.asarray(out.node_sel_mask)[nm].all()
    # every node's cluster lives in its own graph
    cg = np.asarray(out.cluster_graph)
    for i in np.nonzero(nm)[0]:
        assert cg[ci2[i]] == ng[i], i
    # graph-0 isolated nodes (2,3) landed on one of graph-0's seeds
    assert ci2[2] in (0, 1) and ci2[3] in (0, 1)
    # different keys can differ (randomness is live); same key reproduces
    out_b = assign_all_nodes(so, b.senders, b.receivers, b.edge_mask,
                             max_iter=1, key=jax.random.key(0))
    np.testing.assert_array_equal(ci2, np.asarray(out_b.cluster_index))


def test_assign_all_nodes_dense_matches_sparse():
    """The MXU one-hot-matmul propagation (``impl='dense'``) reproduces the
    lexsort voting path exactly on coalesced graphs, including the
    (max count, then smallest cluster id) tie-break."""
    from tgp_tpu.ops.assignment import assign_all_nodes
    from tgp_tpu.select.base import cluster_to_select_output

    for seed in range(4):
        b = make_batch([13, 9, 17], p=0.25, seed=seed * 11, pad_nodes=48,
                       pad_edges=160)
        rng = np.random.default_rng(seed)
        N = b.num_nodes
        nm = np.asarray(b.node_mask)
        ng = np.asarray(b.node_graph)
        # seed a partial selection: ~1/3 of each graph's nodes, cluster id =
        # global node id (so several clusters per graph, distinct ids)
        sel = nm & (rng.random(N) < 0.34)
        for g in range(3):  # guarantee >=1 seed per graph
            idx = np.nonzero(nm & (ng == g))[0]
            sel[idx[0]] = True
        ci = np.where(sel, np.arange(N), 0).astype(np.int64)
        so = cluster_to_select_output(
            jnp.asarray(ci), b, node_sel_mask=jnp.asarray(sel),
            num_clusters=N, max_clusters=b.max_nodes, partial=True)
        outs = {}
        for impl in ("sparse", "dense"):
            outs[impl] = assign_all_nodes(
                so, b.senders, b.receivers, b.edge_mask, max_iter=3,
                node_pos=b.node_pos, max_nodes=b.max_nodes, impl=impl)
        ci_s = np.asarray(outs["sparse"].cluster_index)[nm]
        ci_d = np.asarray(outs["dense"].cluster_index)[nm]
        np.testing.assert_array_equal(ci_s, ci_d)
        np.testing.assert_array_equal(
            np.asarray(outs["sparse"].node_sel_mask),
            np.asarray(outs["dense"].node_sel_mask))


def test_graclus_level_native_failure_fallback(monkeypatch):
    """graclus_level's except-branch: the NumPy twin produces the same
    deterministic matching when the native library is unavailable."""
    import tgp_tpu._native as native_mod
    from tgp_tpu.precoarsen.graclus import graclus_level

    rng = np.random.default_rng(0)
    n = 16
    upper = np.triu(rng.random((n, n)) < 0.3, k=1)
    adj = upper | upper.T
    s, r = np.nonzero(adj)
    ei = np.stack([s, r])
    w = rng.uniform(0.5, 2.0, s.size).astype(np.float32)

    ok = graclus_level(ei, n, w)

    def boom(*a, **k):
        raise OSError("simulated missing native lib")

    monkeypatch.setattr(native_mod, "native_graclus_matching", boom)
    fb = graclus_level(ei, n, w)
    np.testing.assert_array_equal(ok["cluster_index"], fb["cluster_index"])


def test_graclus_matching_numpy_unweighted_and_self_loops():
    """edge_weight=None branch (unit weights) + self-loop skip branch."""
    from tgp_tpu.precoarsen.graclus import graclus_matching_numpy

    ei = np.array([[0, 1, 2, 2, 3], [1, 0, 2, 3, 2]])  # incl. loop (2,2)
    cl = graclus_matching_numpy(ei, 4)
    # (0,1) matched; (2,3) matched despite the self-loop appearing first
    assert cl[0] == cl[1] and cl[2] == cl[3] and cl[0] != cl[2]
