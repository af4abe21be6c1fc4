"""Targeted branch-outcome tests (VERDICT r3 #8: branch coverage → 90%).

Each test hits specific unvisited branch destinations found by
``scripts/linecov.py --missing``; the file is organized by target module.
"""

import builtins
import gzip
import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.utils_graphs import make_batch

# ---------------------------------------------------------------------------
# lift/base.py — dense-unbatched lift: inverse op, reduce matrix, 2-D pool
# ---------------------------------------------------------------------------


def _flat_so(n=7, k=3, b=2, seed=0):
    from tgp_tpu.select.base import SelectOutput

    rng = np.random.default_rng(seed)
    s = rng.dirichlet(np.ones(k), size=n).astype(np.float32)
    node_graph = jnp.asarray((np.arange(n) >= 4).astype(np.int32))
    node_mask = jnp.asarray(np.array([1, 1, 1, 1, 1, 1, 0], bool))
    s = jnp.asarray(s) * node_mask[:, None]
    return SelectOutput(s=s, node_graph=node_graph, node_mask=node_mask,
                        num_clusters=k, num_graphs=b, max_clusters=k)


@pytest.mark.parametrize("reduce_op", ["sum", "mean", "max"])
def test_lift_dense_unbatched_inverse_reduce_matrix(reduce_op):
    from tgp_tpu.lift.base import lift_dense_unbatched

    so = _flat_so()
    x_pool = jnp.asarray(
        np.random.default_rng(1).normal(size=(2, 3, 5)).astype(np.float32))
    out = lift_dense_unbatched(x_pool, so, matrix_op="inverse",
                               reduce_op=reduce_op)
    assert out.shape == (7, 5)
    assert np.isfinite(np.asarray(out)).all()
    assert np.asarray(out)[-1].sum() == 0.0  # masked node stays zero


def test_lift_dense_unbatched_2d_pool_and_bad_reduce():
    from tgp_tpu.lift.base import lift_dense_unbatched

    so = _flat_so()
    flat_pool = jnp.asarray(
        np.random.default_rng(2).normal(size=(6, 5)).astype(np.float32))
    out2 = lift_dense_unbatched(flat_pool, so)  # [B·K, F] reshape path
    out3 = lift_dense_unbatched(flat_pool.reshape(2, 3, 5), so)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out3))
    with pytest.raises(ValueError, match="reduce_op"):
        lift_dense_unbatched(flat_pool, so, reduce_op="median")


def test_lift_dense_unbatched_inverse_is_exact_on_orthogonal_s():
    """For a hard one-hot S, S(SᵀS)⁻¹ recovers x_pool rows exactly."""
    from tgp_tpu.lift.base import lift_dense_unbatched
    from tgp_tpu.select.base import SelectOutput

    s = jnp.asarray(np.eye(3, dtype=np.float32))
    so = SelectOutput(s=s, node_graph=jnp.zeros(3, jnp.int32),
                      node_mask=jnp.ones(3, bool), num_clusters=3,
                      num_graphs=1, max_clusters=3)
    x_pool = jnp.arange(6, dtype=jnp.float32).reshape(1, 3, 2)
    out = lift_dense_unbatched(x_pool, so, matrix_op="inverse")
    np.testing.assert_allclose(np.asarray(out), np.asarray(x_pool[0]),
                               atol=1e-5)


# ---------------------------------------------------------------------------
# ops/ordering.py — explicit engine selection
# ---------------------------------------------------------------------------


def _grid_edges(n):
    s = np.arange(n - 1)
    ei = np.concatenate([np.stack([s, s + 1]), np.stack([s + 1, s])], 1)
    return ei.astype(np.int64)


def test_plan_locality_engine_branches():
    from tgp_tpu.ops.ordering import plan_locality_spmm

    ei = _grid_edges(64)
    plan = plan_locality_spmm(ei, 64, engine="banded", max_window=256)
    assert plan["engine"] == "banded"
    plan = plan_locality_spmm(ei, 64, engine="sorted")
    assert plan["engine"] == "sorted"
    with pytest.raises(ValueError, match="unknown engine"):
        plan_locality_spmm(ei, 64, engine="bogus")
    # a random dense-ish graph whose RCM bandwidth exceeds a tiny window
    rng = np.random.default_rng(0)
    ei2 = rng.integers(0, 64, (2, 400))
    with pytest.raises(ValueError, match="banded engine not applicable"):
        plan_locality_spmm(ei2, 64, engine="banded", max_window=8)


# ---------------------------------------------------------------------------
# ops/pallas/bmm.py — backward transpose combinations (interpret mode)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("ta,tb", [(False, False), (True, False),
                                   (False, True)])
def test_bmm_pallas_grad_transpose_combos(ta, tb):
    from tgp_tpu.ops.pallas.bmm import bmm_pallas

    rng = np.random.default_rng(3)
    B, N, K, M = 2, 8, 8, 8
    a = jnp.asarray(rng.normal(size=(B, K, N) if ta else (B, N, K)),
                    jnp.float32)
    b = jnp.asarray(rng.normal(size=(B, M, K) if tb else (B, K, M)),
                    jnp.float32)

    def f(a, b):
        return jnp.sum(bmm_pallas(a, b, ta, tb, block_b=2,
                                  interpret=True) ** 2)

    def f_ref(a, b):
        aa = jnp.swapaxes(a, -1, -2) if ta else a
        bb = jnp.swapaxes(b, -1, -2) if tb else b
        return jnp.sum(jnp.einsum("bnk,bkm->bnm", aa, bb) ** 2)

    ga, gb = jax.grad(f, argnums=(0, 1))(a, b)
    ra, rb = jax.grad(f_ref, argnums=(0, 1))(a, b)
    # the kernel computes in bf16 on the MXU (and in interpret mode), so
    # gradients are bf16-rounded — compare at bf16 tolerance
    np.testing.assert_allclose(np.asarray(ga), np.asarray(ra), rtol=5e-2,
                               atol=0.2)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(rb), rtol=5e-2,
                               atol=0.2)


# ---------------------------------------------------------------------------
# reduce/aggr.py — softmax aggregation without a mask
# ---------------------------------------------------------------------------


def test_agg_softmax_no_mask():
    from tgp_tpu.reduce.aggr import _agg_softmax

    x = jnp.asarray(np.random.default_rng(4).normal(size=(6, 3)),
                    jnp.float32)
    seg = jnp.asarray([0, 0, 1, 1, 1, 2])
    out = _agg_softmax(x, seg, 3, None)
    # softmax weights sum to one per segment: output is a convex combination
    lo = np.asarray(jax.ops.segment_min(x, seg, num_segments=3))
    hi = np.asarray(jax.ops.segment_max(x, seg, num_segments=3))
    got = np.asarray(out)
    assert (got >= lo - 1e-6).all() and (got <= hi + 1e-6).all()


# ---------------------------------------------------------------------------
# ops/sampling.py — windowed membership test (N above the exact-key cap)
# ---------------------------------------------------------------------------


def test_negative_sampling_windowed_force_undirected():
    from tgp_tpu.graph import GraphBatch
    from tgp_tpu.ops import sampling as S

    N = S._EXACT_KEY_MAX_N + 4  # forces the windowed collides() closure
    E = 64
    rng = np.random.default_rng(5)
    senders = jnp.asarray(rng.integers(0, 100, E), jnp.int32)
    receivers = jnp.asarray(rng.integers(0, 100, E), jnp.int32)
    batch = GraphBatch(
        x=jnp.zeros((N, 1), jnp.float32),
        senders=senders, receivers=receivers,
        edge_weight=jnp.ones(E, jnp.float32),
        node_mask=jnp.ones(N, bool), edge_mask=jnp.ones(E, bool),
        node_graph=jnp.zeros(N, jnp.int32),
        node_pos=jnp.arange(N, dtype=jnp.int32),
        num_graphs=1, max_nodes=N)
    ns, nr, nm = S.negative_edge_sampling(
        jax.random.key(0), batch, force_undirected=True)
    ns, nr, nm = map(np.asarray, (ns, nr, nm))
    assert nm.any()
    # no sampled negative may be an existing edge in EITHER direction
    pos = set(zip(np.asarray(senders).tolist(),
                  np.asarray(receivers).tolist()))
    for s_, r_ in zip(ns[nm].tolist(), nr[nm].tolist()):
        assert (s_, r_) not in pos and (r_, s_) not in pos


# ---------------------------------------------------------------------------
# parallel/multihost.py — single-process fallback
# ---------------------------------------------------------------------------


def test_initialize_multihost_single_process_is_noop():
    from tgp_tpu.parallel.multihost import initialize_multihost

    # no coordinator available in the test env: must return False, not raise
    assert initialize_multihost() is False


# ---------------------------------------------------------------------------
# pooler lifting entry points (asap / lapool / bnpool): x=None vs explicit
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("alias,extra", [
    ("asap", {}), ("lap", {}),
])
def test_sparse_pooler_lifting_x_default(alias, extra):
    from tgp_tpu.poolers import get_pooler

    batch = make_batch([6, 5], num_features=4, seed=6, pad_nodes=16,
                       pad_edges=64)
    pooler = get_pooler(alias, in_channels=4, ratio=0.5, k=2, **extra)
    params = pooler.init(jax.random.key(0), batch)
    out = pooler.apply(params, batch)
    # lifting consumes the POOLED graph; x=None defaults to its features
    pooled = out.graph if out.graph is not None else out.dense
    lifted_default = pooler.apply(params, pooled, so=out.so, lifting=True)
    lifted_explicit = pooler.apply(params, pooled, so=out.so,
                                   lifting=True, x=pooled.x)
    np.testing.assert_allclose(np.asarray(lifted_default),
                               np.asarray(lifted_explicit))


def test_bnpool_lifting_x_default():
    from tgp_tpu.graph import to_dense
    from tgp_tpu.poolers import get_pooler

    batch = make_batch([6, 5], num_features=4, seed=7, pad_nodes=16,
                       pad_edges=64)
    dense = to_dense(batch)
    rngs = {"params": jax.random.key(0), "sample": jax.random.key(1)}
    pooler = get_pooler("bnpool", in_channels=4, k=3)
    params = pooler.init(rngs, dense)
    out = pooler.apply(params, dense, rngs={"sample": jax.random.key(1)})
    lifted_default = pooler.apply(params, out.dense, so=out.so, lifting=True)
    lifted_explicit = pooler.apply(params, out.dense, so=out.so,
                                   lifting=True, x=out.dense.x)
    np.testing.assert_allclose(np.asarray(lifted_default),
                               np.asarray(lifted_explicit))


# ---------------------------------------------------------------------------
# precoarsen/ndp.py — eigensolver failure → random sign partition
# ---------------------------------------------------------------------------


def test_ndp_partition_eigsh_failure_fallback(monkeypatch):
    import scipy.sparse.linalg as spla

    from tgp_tpu.precoarsen import ndp as ndp_mod

    def boom(*a, **k):
        raise spla.ArpackNoConvergence("no convergence", [], [])

    monkeypatch.setattr(ndp_mod.spla, "eigsh", boom)
    ei = _grid_edges(50)  # >40 nodes forces the sparse eigsh path
    out = ndp_mod.ndp_level(ei, 50, np.ones(ei.shape[1], np.float32))
    # fallback partition still produces a valid one-level coarsening
    assert out is not None


# ---------------------------------------------------------------------------
# datasets — edgeless synthetic fallback, gz parsing, blank lines
# ---------------------------------------------------------------------------


def test_synthetic_edgeless_graph_fallback():
    from tgp_tpu.datasets.synthetic import csbm_graph

    x, ei, comm = csbm_graph(
        np.random.default_rng(8), n=5, num_communities=2,
        p_in=0.0, p_out=0.0, feature_dim=3, mu=1.0)
    assert ei.shape == (2, 1)  # placeholder self-edge keeps shapes valid


def test_tudataset_reads_gz_and_blank_lines(tmp_path):
    from tgp_tpu.datasets.tudataset import _read_rows

    p = tmp_path / "DS_node_labels.txt.gz"
    with gzip.open(p, "wt") as f:
        f.write("1\n\n2\n 3 \n\n")
    rows = _read_rows(p)
    assert [float(r[0]) for r in np.atleast_2d(rows)] == [1.0, 2.0, 3.0]


# ---------------------------------------------------------------------------
# mp/pan.py — hop-1-only MET approximation (no dense powers)
# ---------------------------------------------------------------------------


def test_panconv_hop1_approximation_paths():
    from tgp_tpu.mp.pan import PANConv

    batch = make_batch([6, 5], num_features=4, seed=9, pad_nodes=16,
                       pad_edges=64)
    for norm in (True, False):
        conv = PANConv(out_channels=4, filter_size=2, normalize=norm,
                       exact_met_support=False, return_dense_met=False)
        params = conv.init(jax.random.key(0), batch)
        out, met_deg, met_ew = conv.apply(params, batch)
        assert np.isfinite(np.asarray(out)).all()
        assert met_ew.shape == batch.edge_weight.shape


# ---------------------------------------------------------------------------
# losses.py — parameter-branch matrix
# ---------------------------------------------------------------------------


def test_kl_loss_branch_matrix():
    from tgp_tpu.losses import kl_loss

    kl = jnp.asarray([[0.5, 1.0, 0.0], [2.0, 0.0, 0.0]])
    with pytest.raises(ValueError, match="both"):
        kl_loss(kl, mask=jnp.ones((2, 3), bool),
                node_graph=jnp.zeros(2, jnp.int32), num_graphs=1)
    # no mask, no node_graph: plain sum over the node axis
    plain = kl_loss(kl)
    np.testing.assert_allclose(float(plain), (1.5 + 2.0) / 2)
    # no normalizing const with mask
    masked = kl_loss(kl, mask=jnp.asarray([[1, 1, 0], [1, 0, 0]], bool))
    np.testing.assert_allclose(float(masked), (1.5 + 2.0) / 2)


def test_cluster_connectivity_prior_scalar_const():
    from tgp_tpu.losses import cluster_connectivity_prior_loss

    K = jnp.eye(2)
    mu = jnp.zeros((2, 2))
    no_norm = cluster_connectivity_prior_loss(K, mu, 1.0)
    np.testing.assert_allclose(float(no_norm), 1.0)
    scalar_norm = cluster_connectivity_prior_loss(
        K, mu, 1.0, normalizing_const=jnp.asarray(4.0))  # ndim-0 branch
    np.testing.assert_allclose(float(scalar_norm), 0.25)


def test_sparse_bce_unsegmented_mean():
    from tgp_tpu.losses import sparse_bce_reconstruction_loss

    logits = jnp.asarray([10.0, -10.0, 10.0])
    y = jnp.asarray([1.0, 0.0, 1.0])
    loss, cnt = sparse_bce_reconstruction_loss(logits, y)  # plain mean path
    assert float(loss) < 1e-3 and int(cnt) == 3


def test_entropy_loss_unmasked_num_nodes():
    from tgp_tpu.losses import unbatched_entropy_loss

    S = jnp.asarray(np.full((4, 2), 0.5, np.float32))
    # explicit num_nodes overrides the shape-derived denominator
    full = unbatched_entropy_loss(S)
    halved = unbatched_entropy_loss(S, num_nodes=8)
    np.testing.assert_allclose(float(full), 2 * float(halved), rtol=1e-6)


def test_asym_norm_losses_k1_and_unmasked():
    from tgp_tpu.losses import asym_norm_loss, unbatched_asym_norm_loss

    S = jnp.asarray(np.random.default_rng(10).dirichlet(
        np.ones(3), size=(2, 5)).astype(np.float32))
    assert float(asym_norm_loss(S, k=1)) == 0.0
    # unmasked batched path (idx from static N)
    v = asym_norm_loss(S, k=3)
    assert np.isfinite(float(v))
    flat = S.reshape(10, 3)
    assert float(unbatched_asym_norm_loss(
        flat, 1, jnp.zeros(10, jnp.int32), 1)) == 0.0


# ---------------------------------------------------------------------------
# poolers/__init__.py — registry loader error paths
# ---------------------------------------------------------------------------


def test_registry_loader_import_error_paths(monkeypatch):
    import tgp_tpu.poolers as P

    real_import = builtins.__import__

    def broken_in_tree(name, *a, **k):
        if name == "tgp_tpu.poolers.sag":
            raise ImportError("boom", name="tgp_tpu.poolers.sag")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", broken_in_tree)
    with pytest.raises(ImportError):
        P._load_all()

    def missing_optional(name, *a, **k):
        if name == "tgp_tpu.poolers.sag":
            raise ImportError("no dep", name="fancy_optional_dep")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", missing_optional)
    with pytest.warns(RuntimeWarning, match="optional"):
        P._load_all()

    monkeypatch.setattr(builtins, "__import__", real_import)
    assert "sag" in P.pooler_map()  # registry unharmed


# ---------------------------------------------------------------------------
# ops/pallas/segment_spmm.py — auto-block and pad branches (interpret mode)
# ---------------------------------------------------------------------------


def test_sorted_segment_sum_narrow_f_and_128_rows():
    from tgp_tpu.ops.pallas.segment_spmm import sorted_segment_sum_pallas

    rng = np.random.default_rng(11)
    E, F, N = 256, 64, 128  # F < 128 → pad path; N % 256 != 0 → 128 rows
    rids = np.sort(rng.integers(0, N, E)).astype(np.int32)
    msgs = jnp.asarray(rng.normal(size=(E, F)), jnp.float32)
    row_ptr = jnp.asarray(np.searchsorted(rids, np.arange(N + 1)), jnp.int32)
    out = sorted_segment_sum_pallas(msgs, jnp.asarray(rids), row_ptr, N,
                                    interpret=True)
    want = jax.ops.segment_sum(msgs, jnp.asarray(rids), num_segments=N)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-4)
