"""Round-5 large-graph redesign: static CSR aux, scatter-free spmm_csr,
GCNConv fast-CSR branch, and TopkPooling's masked pool_mode.

Oracle strategy (SURVEY §4): every fast path is pinned to the slow/XLA
reference path on the same inputs — values AND gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tgp_tpu.graph import from_graphs
from tgp_tpu.mp.gcn import GCNConv
from tgp_tpu.models.classifiers import PoolingClassifier
from tgp_tpu.ops.pallas.segment_spmm import spmm_csr
from tgp_tpu.poolers import get_pooler


def _rand_batch(seed=0, feat=8, nographs=3, self_loops=False):
    rng = np.random.default_rng(seed)
    graphs = []
    for _ in range(nographs):
        n = int(rng.integers(10, 40))
        e = int(n * 3)
        s, r = rng.integers(0, n, e), rng.integers(0, n, e)
        if not self_loops:
            keep = s != r
            s, r = s[keep], r[keep]
        x = rng.normal(size=(n, feat)).astype(np.float32)
        w = rng.random(s.shape[0]).astype(np.float32) + 0.1
        graphs.append((x, np.stack([s, r]), w))
    return from_graphs(graphs, sort_edges=True)


def test_csr_aux_matches_numpy_reference():
    b = _rand_batch(1)
    s, r, w = map(np.asarray, (b.senders, b.receivers, b.edge_weight))
    rp = np.asarray(b.row_ptr)
    assert rp.shape[0] % 256 == 1  # rows_pad multiple of 256, +1
    # row_ptr delimits receiver runs over ALL edge slots
    for node in range(b.num_nodes):
        seg = r[rp[node]: rp[node + 1]]
        assert (seg == node).all()
    assert rp[-1] == b.num_edges
    # transpose layout is a permutation of the edge list, sorted by sender
    st, rt, wt = map(np.asarray, (b.senders_t, b.receivers_t,
                                  b.edge_weight_t))
    assert (np.sort(st) == st).all()
    ref = sorted(zip(s.tolist(), r.tolist(), w.tolist()))
    got = sorted(zip(st.tolist(), rt.tolist(), wt.tolist()))
    assert ref == got
    # in_degree = Σ|w| by receiver over valid edges
    deg = np.bincount(r, weights=np.abs(w) * np.asarray(b.edge_mask),
                      minlength=b.num_nodes)
    np.testing.assert_allclose(np.asarray(b.in_degree), deg, rtol=1e-6)


def test_spmm_csr_matches_xla_segment_sum():
    b = _rand_batch(2, feat=8)
    N = b.num_nodes
    h = jnp.asarray(np.random.default_rng(0).normal(
        size=(N, 8)).astype(np.float32))
    w = jnp.where(b.edge_mask, b.edge_weight, 0.0)

    def fast(h, w):
        return spmm_csr(h, w, b.edge_weight_t, b.senders, b.receivers,
                        b.row_ptr, b.receivers_t, b.senders_t, b.row_ptr_t,
                        N, True)

    def ref(h, w):
        return jax.ops.segment_sum(h[b.senders] * w[:, None], b.receivers,
                                   num_segments=N)

    np.testing.assert_allclose(np.asarray(fast(h, w)),
                               np.asarray(ref(h, w)), atol=1e-5)
    # gradients: d_h through the transpose kernel, d_w through SDDMM
    g_fast = jax.grad(lambda h, w: (fast(h, w) ** 2).sum(), argnums=(0, 1))(
        h, w)
    g_ref = jax.grad(lambda h, w: (ref(h, w) ** 2).sum(), argnums=(0, 1))(
        h, w)
    np.testing.assert_allclose(np.asarray(g_fast[0]), np.asarray(g_ref[0]),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(g_fast[1]), np.asarray(g_ref[1]),
                               atol=1e-4)


@pytest.mark.parametrize("masked", [False, True])
def test_gcnconv_fast_csr_matches_xla(masked):
    b = _rand_batch(3)
    if masked:
        nm = np.asarray(b.node_mask) & (np.arange(b.num_nodes) % 3 != 0)
        # contract: whoever shrinks node_mask below the edges' endpoints
        # must set node_mask_shrunk (masked pooling does)
        b = b.replace(node_mask=jnp.asarray(nm), in_degree=None,
                      node_mask_shrunk=True,
                      x=jnp.where(jnp.asarray(nm)[:, None], b.x, 0.0))
    conv_fast = GCNConv(8, use_pallas=True)
    conv_xla = GCNConv(8, use_pallas=False)
    p = conv_xla.init(jax.random.key(0), b, b.x)
    o_fast = conv_fast.apply(p, b, b.x)
    o_xla = conv_xla.apply(p, b, b.x)
    np.testing.assert_allclose(np.asarray(o_fast), np.asarray(o_xla),
                               atol=2e-5)
    g_fast = jax.grad(
        lambda x: (conv_fast.apply(p, b.replace(x=x), x) ** 2).sum())(b.x)
    g_xla = jax.grad(
        lambda x: (conv_xla.apply(p, b.replace(x=x), x) ** 2).sum())(b.x)
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_xla),
                               atol=2e-4)


def test_masked_pool_matches_compact_through_classifier():
    b = _rand_batch(4)
    pc = get_pooler("topk", in_channels=16, ratio=0.5, pool_mode="compact")
    pm = get_pooler("topk", in_channels=16, ratio=0.5, pool_mode="masked")
    mc = PoolingClassifier(pooler=pc, num_classes=3, hidden=16,
                           use_pallas=True)
    mm = PoolingClassifier(pooler=pm, num_classes=3, hidden=16,
                           use_pallas=True)
    p = mc.init(jax.random.key(0), b)
    lc, _ = mc.apply(p, b)
    lm, _ = mm.apply(p, b)
    np.testing.assert_allclose(np.asarray(lc), np.asarray(lm), atol=1e-5)
    gc = jax.grad(lambda p: mc.apply(p, b)[0].sum())(p)
    gm = jax.grad(lambda p: mm.apply(p, b)[0].sum())(p)
    for a, c in zip(jax.tree.leaves(gc), jax.tree.leaves(gm)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=2e-4)


def test_masked_pool_multi_level():
    """Masked pooling composes: a second level pools the masked graph."""
    b = _rand_batch(5)
    pool = get_pooler("topk", in_channels=8, ratio=0.5, pool_mode="masked")
    p = pool.init(jax.random.key(0), b)
    out1 = pool.apply(p, b)
    g1 = out1.graph
    assert g1.num_nodes == b.num_nodes  # same node space
    assert int(np.asarray(g1.node_mask).sum()) < int(
        np.asarray(b.node_mask).sum())
    out2 = pool.apply(p, g1)
    kept2 = np.asarray(out2.graph.node_mask)
    assert kept2.sum() < np.asarray(g1.node_mask).sum()
    assert not (kept2 & ~np.asarray(g1.node_mask)).any()  # subset


def test_masked_lift_matches_compact_lift():
    b = _rand_batch(6)
    pc = get_pooler("topk", in_channels=8, ratio=0.5, pool_mode="compact")
    pm = get_pooler("topk", in_channels=8, ratio=0.5, pool_mode="masked")
    p = pc.init(jax.random.key(0), b)
    oc = pc.apply(p, b)
    om = pm.apply(p, b)
    lift_c = pc.apply(p, b, so=oc.so, lifting=True, x=oc.graph.x)
    lift_m = pm.apply(p, b, so=om.so, lifting=True, x=om.graph.x)
    np.testing.assert_allclose(np.asarray(lift_c), np.asarray(lift_m),
                               atol=1e-5)


def test_auto_mode_stays_compact_on_cpu_small():
    b = _rand_batch(7)
    pool = get_pooler("topk", in_channels=8, ratio=0.5)  # pool_mode="auto"
    p = pool.init(jax.random.key(0), b)
    out = pool.apply(p, b)
    # compact: supernode space, not the original node space
    assert out.graph.num_nodes == b.num_graphs * out.so.max_clusters
    assert out.so.extras.get("pool_mode") != "masked"


def test_loader_auto_sort_edges_regime():
    from tgp_tpu.data.loaders import BucketedGraphLoader, GraphLoader
    from tgp_tpu.ops.sparse import PALLAS_MIN_EDGES

    rng = np.random.default_rng(0)
    graphs = []
    for _ in range(4):
        n = 20
        s, r = rng.integers(0, n, 40), rng.integers(0, n, 40)
        graphs.append((rng.normal(size=(n, 4)).astype(np.float32),
                       np.stack([s, r])))
    # small edge budget → auto stays unsorted (no host argsort cost)
    small = next(iter(GraphLoader(graphs, batch_size=2)))
    assert not small.edges_sorted and small.row_ptr is None
    # explicit True → sorted + CSR aux regardless of budget
    forced = next(iter(GraphLoader(graphs, batch_size=2, sort_edges=True)))
    assert forced.edges_sorted and forced.row_ptr is not None
    rr = np.asarray(forced.receivers)
    assert (np.diff(rr) >= 0).all()
    # large edge budget → auto sorts (the Pallas regime)
    big = next(iter(GraphLoader(graphs, batch_size=2,
                                pad_edges=PALLAS_MIN_EDGES)))
    assert big.edges_sorted and big.row_ptr is not None
    # bucketed loader: same auto behavior per bucket
    fb = next(iter(BucketedGraphLoader(graphs, batch_size=2,
                                       sort_edges=True)))
    assert fb.edges_sorted and fb.row_ptr is not None


def test_sag_masked_matches_compact():
    b = _rand_batch(8, feat=8)
    pc = get_pooler("sag", in_channels=8, ratio=0.5, pool_mode="compact")
    pm = get_pooler("sag", in_channels=8, ratio=0.5, pool_mode="masked")
    mc = PoolingClassifier(pooler=pc, num_classes=3, hidden=8,
                           use_pallas=True)
    mm = PoolingClassifier(pooler=pm, num_classes=3, hidden=8,
                           use_pallas=True)
    p = mc.init(jax.random.key(0), b)
    lc, _ = mc.apply(p, b)
    lm, _ = mm.apply(p, b)
    np.testing.assert_allclose(np.asarray(lc), np.asarray(lm), atol=1e-5)
    gc = jax.grad(lambda p: mc.apply(p, b)[0].sum())(p)
    gm = jax.grad(lambda p: mm.apply(p, b)[0].sum())(p)
    for a, c in zip(jax.tree.leaves(gc), jax.tree.leaves(gm)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=2e-4)


@pytest.mark.parametrize("ratio", [0.25, 0.5, 0.9])
def test_masked_matches_compact_ratio_sweep(ratio):
    b = _rand_batch(9)
    pc = get_pooler("topk", in_channels=16, ratio=ratio,
                    pool_mode="compact", multiplier=2.0)
    pm = get_pooler("topk", in_channels=16, ratio=ratio,
                    pool_mode="masked", multiplier=2.0)
    mc = PoolingClassifier(pooler=pc, num_classes=3, hidden=16,
                           use_pallas=True)
    mm = PoolingClassifier(pooler=pm, num_classes=3, hidden=16,
                           use_pallas=True)
    p = mc.init(jax.random.key(1), b)
    np.testing.assert_allclose(np.asarray(mc.apply(p, b)[0]),
                               np.asarray(mm.apply(p, b)[0]), atol=1e-5)


def test_masked_min_score_matches_compact():
    b = _rand_batch(10)
    kw = dict(in_channels=16, ratio=0.5, min_score=0.02)
    pc = get_pooler("topk", pool_mode="compact", **kw)
    pm = get_pooler("topk", pool_mode="masked", **kw)
    mc = PoolingClassifier(pooler=pc, num_classes=3, hidden=16,
                           use_pallas=True)
    mm = PoolingClassifier(pooler=pm, num_classes=3, hidden=16,
                           use_pallas=True)
    p = mc.init(jax.random.key(2), b)
    np.testing.assert_allclose(np.asarray(mc.apply(p, b)[0]),
                               np.asarray(mm.apply(p, b)[0]), atol=1e-5)


def test_spmm_batch_paths_agree():
    from tgp_tpu.ops.sparse import spmm_batch

    b = _rand_batch(11, feat=8)
    x = jnp.asarray(np.random.default_rng(1).normal(
        size=(b.num_nodes, 8)).astype(np.float32))
    # reference: plain XLA scatter on the same masked COO
    w = jnp.where(b.edge_mask, b.edge_weight, 0.0)
    ref = jax.ops.segment_sum(x[b.senders] * w[:, None], b.receivers,
                              num_segments=b.num_nodes)
    got_sorted = spmm_batch(b, x)
    np.testing.assert_allclose(np.asarray(got_sorted), np.asarray(ref),
                               atol=1e-5)
    # no-aux batch falls back to the scatter path
    plain = b.replace(row_ptr=None, senders_t=None, receivers_t=None,
                      edge_weight_t=None, row_ptr_t=None, in_degree=None)
    np.testing.assert_allclose(np.asarray(spmm_batch(plain, x)),
                               np.asarray(ref), atol=1e-5)
    # masked batch: product covers the induced subgraph only
    nm = np.asarray(b.node_mask) & (np.arange(b.num_nodes) % 2 == 0)
    bm = b.replace(node_mask=jnp.asarray(nm), node_mask_shrunk=True,
                   in_degree=None)
    wm = w * nm[b.senders] * nm[b.receivers]
    ref_m = jax.ops.segment_sum(x[b.senders] * wm[:, None], b.receivers,
                                num_segments=b.num_nodes)
    got_m = spmm_batch(bm, x)
    # sender-side masking only (receiver rows of dropped nodes are the
    # caller's to mask) — compare on kept receiver rows
    np.testing.assert_allclose(np.asarray(got_m)[nm], np.asarray(ref_m)[nm],
                               atol=1e-5)
    # abs_weights gives degree-style sums
    deg = spmm_batch(b, jnp.ones((b.num_nodes, 1)), abs_weights=True)[:, 0]
    np.testing.assert_allclose(np.asarray(deg), np.asarray(b.in_degree),
                               rtol=1e-5)
