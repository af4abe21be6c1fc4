"""Round-4 deep-review regression tests: aggregation mask/budget bugs,
BNPool padding/freeze semantics, LOBPCG smallest-eigenpair correctness,
bipartite sampler overflow guard."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tgp_tpu.graph import from_graphs
from tgp_tpu.reduce.aggr import get_aggr


# ---------------------------------------------------------------- aggr
def test_softmax_aggr_multifeature_with_mask():
    """softmax aggregation crashed with a reshape TypeError for F>1 when a
    mask was given (the [N,1] mask hit segment_max's same-ndim reshape)."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(10, 3)), jnp.float32)
    seg = jnp.asarray(rng.integers(0, 4, 10), jnp.int32)
    mask = jnp.asarray(rng.random(10) < 0.8)
    out = get_aggr("softmax")(x, seg, 4, mask)
    assert out.shape == (4, 3)
    assert np.all(np.isfinite(np.asarray(out)))
    # numpy oracle on segment 0
    xs = np.asarray(x)
    m = np.asarray(mask) & (np.asarray(seg) == 0)
    if m.any():
        w = np.exp(xs[m] - xs[m].max(0))
        w = w / w.sum(0)
        np.testing.assert_allclose(np.asarray(out)[0], (w * xs[m]).sum(0),
                                   rtol=1e-5, atol=1e-5)


def test_degree_scaler_budget_invariant():
    """PNA degree scalers must not depend on the static cluster budget:
    empty slots must not dilute the batch-average log-degree."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(20, 2)), jnp.float32)
    seg = jnp.asarray(rng.integers(0, 4, 20), jnp.int32)
    mask = jnp.ones(20, bool)
    small = get_aggr("degree_scaler")(x, seg, 4, mask)
    big = get_aggr("degree_scaler")(x, seg, 64, mask)
    np.testing.assert_allclose(np.asarray(small), np.asarray(big)[:4],
                               rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------- bnpool
def _mk_graph(n, seed, p=0.4):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, 4)).astype(np.float32)
    A = (rng.random((n, n)) < p)
    A = np.triu(A, 1)
    A = A | A.T
    s, r = np.nonzero(A)
    return x, np.stack([s, r])


def _bnpool(batched, **kw):
    from tgp_tpu.poolers import get_pooler
    return get_pooler("bnpool", in_channels=4, k=3, batched=batched, **kw)


def test_bnpool_sparse_kl_ignores_padding_nodes():
    """Padding rows carry node_graph = B-1; their KL (posterior != prior at
    init) must not leak into the last graph's loss."""
    p = _bnpool(False)
    gs = [_mk_graph(6, 0), _mk_graph(5, 1)]
    b1 = from_graphs(gs, pad_nodes=16, pad_edges=64)
    b2 = from_graphs(gs, pad_nodes=48, pad_edges=64)
    params = p.init({"params": jax.random.PRNGKey(0),
                     "sample": jax.random.PRNGKey(1)}, b1)
    kls = []
    for b in (b1, b2):
        out = p.apply(params, b, rngs={"sample": jax.random.PRNGKey(2)})
        kls.append(float(out.loss["kl"]))
    assert kls[0] == pytest.approx(kls[1], rel=1e-5)


def test_bnpool_dense_empty_graph_row_no_nan():
    from tgp_tpu.graph import to_dense
    p = _bnpool(True)
    b = from_graphs([_mk_graph(6, 0)])
    d = to_dense(b)
    # append an all-padding graph row
    d = d.replace(
        x=jnp.concatenate([d.x, jnp.zeros_like(d.x)]),
        adj=jnp.concatenate([d.adj, jnp.zeros_like(d.adj)]),
        mask=jnp.concatenate([d.mask, jnp.zeros_like(d.mask)]))
    params = p.init({"params": jax.random.PRNGKey(0),
                     "sample": jax.random.PRNGKey(1)}, d)
    out = p.apply(params, d, rngs={"sample": jax.random.PRNGKey(2)})
    for name, v in out.loss.items():
        assert np.isfinite(float(v)), name


def test_bnpool_train_k_false_freezes_K():
    """Reference creates K with requires_grad=train_K — with train_K=False
    the reconstruction gradient must not update K."""
    b = from_graphs([_mk_graph(6, 0)])
    for flag, expect_zero in ((False, True), (True, False)):
        p = _bnpool(True, train_K=flag)
        params = p.init({"params": jax.random.PRNGKey(0),
                         "sample": jax.random.PRNGKey(1)}, b)

        def loss_fn(pp):
            out = p.apply(pp, b, rngs={"sample": jax.random.PRNGKey(2)})
            return sum(jnp.sum(v) for v in out.loss.values())

        g = jax.grad(loss_fn)(params)
        gk = np.asarray(g["params"]["K"])
        assert (np.allclose(gk, 0.0) == expect_zero), (flag, gk)


# ---------------------------------------------------------------- lobpcg
def test_lobpcg_smallest_of_psd_laplacian():
    """largest=False on a PSD Laplacian used to collapse into the spurious
    null space of the Ritz subspace and return zero vectors."""
    from tgp_tpu.ops.lap import lobpcg
    rng = np.random.default_rng(0)
    N = 40
    M = rng.random((N, N)) < 0.15
    M[np.arange(N - 1), np.arange(1, N)] = True  # chain: keep it connected
    M = np.triu(M, 1)
    M = M | M.T
    L = np.diag(M.sum(1)) - M
    si, ri = np.nonzero(L)
    ev, V = lobpcg(jnp.asarray(si, jnp.int32), jnp.asarray(ri, jnp.int32),
                   jnp.asarray(L[si, ri], jnp.float32), N, k=3,
                   largest=False, num_iters=200)
    true = np.sort(np.linalg.eigvalsh(L))[:3]
    np.testing.assert_allclose(np.sort(np.asarray(ev)), true, atol=1e-3)
    # eigenvectors are unit, not degenerate zeros
    np.testing.assert_allclose(np.linalg.norm(np.asarray(V), axis=0),
                               1.0, atol=1e-4)


def test_lobpcg_tol_early_exit_matches():
    from tgp_tpu.ops.lap import lobpcg
    rng = np.random.default_rng(3)
    N = 30
    M = rng.random((N, N)) < 0.2
    M = np.triu(M, 1)
    M = M | M.T
    L = np.diag(M.sum(1)) - M
    si, ri = np.nonzero(L)
    args = (jnp.asarray(si, jnp.int32), jnp.asarray(ri, jnp.int32),
            jnp.asarray(L[si, ri], jnp.float32), N)
    ev_tol, _ = lobpcg(*args, k=2, largest=True, num_iters=500, tol=1e-5)
    true = np.sort(np.linalg.eigvalsh(L))[::-1][:2]
    np.testing.assert_allclose(np.asarray(ev_tol), true, atol=1e-3)


# ---------------------------------------------------------------- sampling
def test_bipartite_sampling_huge_node_sets_no_overflow():
    """num_src·num_dst beyond int32 must route to the windowed membership
    test instead of silently wrapping the edge keys."""
    from tgp_tpu.ops.sampling import bipartite_negative_edge_sampling
    rng = np.random.default_rng(0)
    n_src = n_dst = 100_000  # product 1e10 >> 2^31
    E = 64
    s = jnp.asarray(rng.integers(0, n_src, E), jnp.int32)
    r = jnp.asarray(rng.integers(0, n_dst, E), jnp.int32)
    em = jnp.ones(E, bool)
    ns, nr, nm = bipartite_negative_edge_sampling(
        jax.random.PRNGKey(0), s, r, em, n_src, n_dst)
    assert bool(nm.any())
    # no sampled "negative" may be a real edge
    real = set(zip(np.asarray(s).tolist(), np.asarray(r).tolist()))
    for a, c, ok in zip(np.asarray(ns), np.asarray(nr), np.asarray(nm)):
        if ok:
            assert (int(a), int(c)) not in real


# ------------------------------------------------------------- transforms
def test_sortnodes_three_tuple_and_none_weight():
    """(x, ei, y) shorthand and (x, ei, None, y) both work; previously the
    3-tuple raised and the explicit-None form produced NaN edge weights."""
    from tgp_tpu.data.transforms import SortNodes
    x = np.arange(8, dtype=np.float32).reshape(4, 2)
    ei = np.array([[0, 1, 2], [1, 2, 3]])
    y = np.array([2, 0, 1, 0])
    for graph in [(x, ei, y), (x, ei, None, y)]:
        out = SortNodes()(graph)
        x2, ei2, y2 = out[0], out[1], out[-1]
        assert np.all(np.diff(y2) >= 0)
        # edge endpoints still connect the same feature rows
        for e in range(ei.shape[1]):
            np.testing.assert_array_equal(x2[ei2[0, e]], x[ei[0, e]])
    # a 3-tuple output slots back through from_graphs cleanly (no NaN ew)
    from tgp_tpu.graph import from_graphs
    x2, ei2, y2 = SortNodes()((x, ei, y))
    b = from_graphs([(x2, ei2)])
    assert np.isfinite(np.asarray(b.edge_weight)).all()


def test_normalize_adj_preserves_y_and_composes():
    from tgp_tpu.data.transforms import NormalizeAdj, SortNodes
    x = np.ones((4, 2), np.float32)
    ei = np.array([[0, 1, 2], [1, 2, 3]])
    ew = np.ones(3, np.float32)
    y = np.array([1, 0, 2, 0])
    out = NormalizeAdj()((x, ei, ew, y))
    assert len(out) == 4  # y preserved
    np.testing.assert_array_equal(out[3], y)
    # composition NormalizeAdj -> SortNodes no longer crashes
    res = SortNodes()(out)
    assert np.all(np.diff(res[-1]) >= 0)


def test_precoarsening_kwargs_apply_to_list_aliases():
    from tgp_tpu.precoarsen.api import PreCoarsening
    pc = PreCoarsening(poolers=["ndp", "ndp"],
                       kwargs={"sparse_threshold": 0.5})
    cfgs = pc._normalized()
    assert all(kw == {"sparse_threshold": 0.5} for _, kw in cfgs)


def test_precoarsening_tuple_of_aliases_and_bad_config():
    from tgp_tpu.precoarsen.api import PreCoarsening
    # a tuple of alias strings is a per-level list, not (alias, kwargs)
    cfgs = PreCoarsening(poolers=("ndp", "graclus"))._normalized()
    assert cfgs == [("ndp", {}), ("graclus", {})]
    with pytest.raises(ValueError, match="alias"):
        PreCoarsening(poolers=[("ndp", "oops")])._normalized()


def test_precoarsening_passes_y_through():
    from tgp_tpu.precoarsen.api import PreCoarsening
    rng = np.random.default_rng(0)
    x = rng.normal(size=(12, 3)).astype(np.float32)
    A = np.triu(rng.random((12, 12)) < 0.4, 1)
    A = A | A.T
    s, r = np.nonzero(A)
    ei = np.stack([s, r])
    y = rng.integers(0, 3, 12)
    out = PreCoarsening(poolers="graclus", levels=1)((x, ei, None, y))
    # (x, ei, y, levels)
    assert len(out) == 4
    np.testing.assert_array_equal(out[2], y)
    assert isinstance(out[3], list) and len(out[3]) == 1


# ---------------------------------------------------------------- pallas
def test_banded_vjp_row_ptr_ignores_padding_edges():
    """-1 padding receivers (sorted last) were clipped into row 0, shifting
    every CSR row bound; segment-sum drop semantics fixes it."""
    from tgp_tpu.ops.pallas.segment_spmm import _banded_spmm_vjp
    rng = np.random.default_rng(0)
    N, E, F, PAD = 40, 120, 8, 40
    s = rng.integers(0, N, E)
    r = np.sort(rng.integers(0, N, E))
    w = rng.normal(size=E).astype(np.float32)
    # padding block: receiver -1, zero weight, sorted last
    s_all = jnp.asarray(np.concatenate([s, np.zeros(PAD, np.int64)]))
    r_all = jnp.asarray(np.concatenate([r, -np.ones(PAD, np.int64)]))
    w_all = jnp.asarray(np.concatenate([w, np.zeros(PAD, np.float32)]))
    x = jnp.asarray(rng.normal(size=(N, F)), jnp.float32)
    got = _banded_spmm_vjp(x, s_all, r_all, w_all, N, window=128,
                           interpret=True)
    want = np.zeros((N, F), np.float32)
    np.add.at(want, r, np.asarray(x)[s] * w[:, None])
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------- maxcut
def test_maxcut_partial_connect_uses_full_assignment():
    """assign_all_nodes=False must still CONNECT on the full assignment
    (reference maxcut.py:200-214): pooled connectivity mediated by
    non-selected nodes survives."""
    from tgp_tpu.poolers import get_pooler
    # path graph 0-1-2-3-4: top-2 keeps two non-adjacent nodes; the partial
    # subgraph A[kept,kept] has NO edges, the full assignment does
    x = np.asarray([[3.0], [0.1], [2.0], [0.2], [0.3]], np.float32)
    ei = np.array([[0, 1, 1, 2, 2, 3, 3, 4],
                   [1, 0, 2, 1, 3, 2, 4, 3]])
    b = from_graphs([(x, ei)], pad_nodes=8, pad_edges=16)
    p = get_pooler("maxcut", in_channels=1, ratio=2,
                   assign_all_nodes=False, remove_self_loops=True)
    params = p.init(jax.random.PRNGKey(0), b)
    out = p.apply(params, b)
    g = out.graph
    assert bool(np.asarray(g.edge_mask).any()), (
        "full-assignment connect must produce pooled edges on a path graph")
    assert out.so.partial  # the selection itself stays partial


def test_asap_dropout_is_applied():
    from tgp_tpu.poolers import get_pooler
    rng = np.random.default_rng(0)
    x = rng.normal(size=(10, 4)).astype(np.float32)
    A = np.triu(rng.random((10, 10)) < 0.5, 1)
    A = A | A.T
    s, r = np.nonzero(A)
    b = from_graphs([(x, np.stack([s, r]))])
    p = get_pooler("asap", in_channels=4, ratio=0.5, dropout=0.5)
    params = p.init(jax.random.PRNGKey(0), b)
    det = p.apply(params, b)
    stoch = p.apply(params, b, deterministic=False,
                    rngs={"dropout": jax.random.PRNGKey(1)})
    assert not np.allclose(np.asarray(det.graph.x),
                           np.asarray(stoch.graph.x))


def test_sep_relocate_self_loops_objective():
    """Self-loop weight must not drift the structural-entropy objective:
    the partition of a self-looped graph matches the same graph without
    self-loops when the loop weights are small."""
    from tgp_tpu.precoarsen.sep import sep_levels
    rng = np.random.default_rng(1)
    n = 20
    upper = np.triu(rng.random((n, n)) < 0.3, 1)
    adj = upper | upper.T
    s, r = np.nonzero(adj)
    ei = np.stack([s, r])
    out_plain = sep_levels(ei, n, levels=1)
    # add tiny self-loops on every node
    loops = np.arange(n)
    ei_sl = np.concatenate([ei, np.stack([loops, loops])], 1)
    w_sl = np.concatenate([np.ones(ei.shape[1]), np.full(n, 1e-6)])
    out_sl = sep_levels(ei_sl, n, edge_weight=w_sl, levels=1)
    ci0 = out_plain[0]["cluster_index"]
    ci1 = out_sl[0]["cluster_index"]
    # same partition up to relabeling
    import itertools
    m = {}
    same = True
    for a, c in zip(ci0, ci1):
        if a in m and m[a] != c:
            same = False
            break
        m[a] = c
    assert same and len(set(ci0)) == len(set(ci1))


# ------------------------------------------------- final review slice (r4f)

def test_segment_normalize_2d_data_1d_mask():
    """mask [N] must broadcast against data [N, F] (the passthrough leg
    previously did jnp.where(mask, out, data) with mismatched ranks)."""
    from tgp_tpu.ops.segment import segment_normalize

    v = jnp.asarray([[1.0, -2.0], [3.0, 4.0], [5.0, -6.0], [7.0, 8.0]])
    seg = jnp.asarray([0, 0, 1, 1])
    mask = jnp.asarray([True, True, True, False])
    out = np.asarray(segment_normalize(v, seg, 2, mask=mask, ord="max_abs"))
    # masked-out row passes through unchanged
    np.testing.assert_allclose(out[3], [7.0, 8.0])
    # valid rows normalized by per-segment per-column max-abs
    np.testing.assert_allclose(out[0], [1.0 / 3.0, -2.0 / 4.0], rtol=1e-6)
    np.testing.assert_allclose(out[2], [1.0, -1.0], rtol=1e-6)


def test_precoarsen_graph_hash_distinguishes_edge_weights():
    from tgp_tpu.utils.checkpoint import PrecoarsenCache

    x = np.ones((4, 3), np.float32)
    ei = np.array([[0, 1, 2], [1, 2, 3]])
    h0 = PrecoarsenCache.graph_hash(x, ei)
    h1 = PrecoarsenCache.graph_hash(x, ei, np.array([1.0, 1.0, 1.0]))
    h2 = PrecoarsenCache.graph_hash(x, ei, np.array([1.0, 2.0, 3.0]))
    assert h0 != h1 and h1 != h2


def test_precoarsen_cache_corrupt_entry_is_miss(tmp_path):
    from tgp_tpu.utils.checkpoint import PrecoarsenCache

    cache = PrecoarsenCache(root=tmp_path / "c")
    config = {"poolers": "graclus", "levels": 1, "kwargs": {}}
    path = cache._path(config, "deadbeef")
    path.write_bytes(b"not an npz at all")
    assert cache.get(config, "deadbeef") is None
    assert not path.exists()  # poisoned entry evicted, not permanent


def test_precoarsen_cache_atomic_put_no_tmp_left(tmp_path):
    from tgp_tpu.utils.checkpoint import PrecoarsenCache

    cache = PrecoarsenCache(root=tmp_path / "c")
    config = {"poolers": "graclus", "levels": 1, "kwargs": {}}
    cache.put(config, "cafebabe", [{"cluster_index": np.arange(3)}])
    leftovers = [p for p in (tmp_path / "c").iterdir()
                 if ".tmp" in p.name]
    assert leftovers == []
    assert cache.get(config, "cafebabe") is not None


def test_precoarsen_cache_tuple_shape_matches_cold_path(tmp_path):
    """Cached path must return the same tuple shape as transform(g):
    explicit-None weight slot dropped, labels preserved."""
    from tgp_tpu.precoarsen import PreCoarsening
    from tgp_tpu.utils.checkpoint import PrecoarsenCache
    from tests.utils_graphs import erdos_renyi_graph

    x, ei = erdos_renyi_graph(10, p=0.5, num_features=3, seed=0)[:2]
    y = np.arange(10) % 2
    g = (x, ei, None, y)
    cache = PrecoarsenCache(root=tmp_path / "c")
    tf = PreCoarsening(poolers="graclus", levels=1)
    cold = cache.precoarsen_with_cache(tf, [g])[0]
    warm = cache.precoarsen_with_cache(tf, [g])[0]
    assert len(cold) == len(warm) == 4  # (x, ei, y, levels)
    np.testing.assert_array_equal(np.asarray(cold[2]), np.asarray(warm[2]))
    assert len(cold[-1]) == len(warm[-1]) == 1


def test_banded_window_covers_128_row_blocks():
    """plan_locality_spmm must size the window for the kernel's real
    128-row blocks even when the caller passes a smaller block_rows —
    an under-sized window silently drops out-of-window senders."""
    from tgp_tpu.ops.ordering import locality_spmm, plan_locality_spmm

    n = 200  # path graph: bandwidth 1 after RCM
    src = np.arange(n - 1)
    ei = np.stack([np.concatenate([src, src + 1]),
                   np.concatenate([src + 1, src])])
    plan = plan_locality_spmm(ei, n, block_rows=8, engine="banded")
    assert plan["window"] >= 2 * plan["bandwidth"] + 128

    rng = np.random.default_rng(0)
    x = rng.standard_normal((n, 8)).astype(np.float32)
    xp = x[plan["perm"]]
    out = np.asarray(locality_spmm(plan, jnp.asarray(xp), interpret=True))
    # dense oracle in plan order
    inv = plan["inv"]
    ei_new = inv[ei]
    A = np.zeros((n, n), np.float32)
    A[ei_new[1], ei_new[0]] = 1.0
    np.testing.assert_allclose(out, A @ xp, rtol=1e-5, atol=1e-5)
