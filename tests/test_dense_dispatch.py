"""Model-level regime dispatch (VERDICT r3 #2b): the documented default
path — ``PoolingClassifier`` + ``get_pooler`` — must ride the scatter-free
dense pipeline for small-graph batches, with outputs matching the sparse
pipeline given the same parameters (reference behavior to match: users of
tgp/src.py:310-557 get the fast dense path by just picking a dense pooler).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tgp_tpu.graph import DenseGraphBatch, GraphBatch, from_graphs, to_dense
from tgp_tpu.models.classifiers import PoolingClassifier
from tgp_tpu.models.prepare import prepare_batch
from tgp_tpu.mp.gcn import gcn_norm_dense
from tgp_tpu.ops.sparse import (
    DENSE_PIPELINE_MAX_NODES,
    use_dense_pipeline,
)
from tgp_tpu.poolers import get_pooler
from tgp_tpu.reduce.base import reduce_dense_batched
from tests.utils_graphs import make_batch


def _sparse_pooled_as_dense(out):
    """Scatter a sparse-layout topk PoolingOutput into dense [B,K,*]."""
    return to_dense(out.graph)


# ---------------------------------------------------------------------------
# regime map
# ---------------------------------------------------------------------------


def test_use_dense_pipeline_regime_map():
    # flagship bench shape: dense wins
    assert use_dense_pipeline(64, 256)
    # beyond the crossover width: sparse
    assert not use_dense_pipeline(1, DENSE_PIPELINE_MAX_NODES + 1)
    # adjacency byte budget: 2048-wide graphs are fine alone, not at B=4096
    assert use_dense_pipeline(1, 2048)
    assert not use_dense_pipeline(4096, 2048)


def test_prepare_batch_routing():
    b = make_batch([6, 5], num_features=4, seed=0)
    # pooler=None is CONSERVATIVE (VERDICT r4 weak #2): auto never
    # densifies without knowing the pooler can take a DenseGraphBatch
    assert prepare_batch(b) is b
    # with a dense-capable pooler, the small batch is densified
    pooler = get_pooler("topk", in_channels=4, ratio=0.5)
    out = prepare_batch(b, pooler=pooler)
    assert isinstance(out, DenseGraphBatch)

    assert prepare_batch(b, densify=False) is b
    forced = prepare_batch(b, densify=True)  # explicit force: no pooler ok
    assert isinstance(forced, DenseGraphBatch)

    # wide batch stays sparse under "auto" even with a dense-capable pooler
    wide = make_batch([DENSE_PIPELINE_MAX_NODES + 5], num_features=2,
                      p=0.01, seed=1)
    assert isinstance(prepare_batch(wide, pooler=pooler), GraphBatch)

    # an already-dense batch passes through (optionally normalized)
    d = to_dense(b)
    assert prepare_batch(d) is d
    nd = prepare_batch(d, normalize=True, adj_dtype=None)
    assert isinstance(nd, DenseGraphBatch)


def test_prepare_batch_normalize_matches_gcn_norm_dense():
    b = make_batch([8, 6], num_features=4, seed=2, weighted=True)
    got = prepare_batch(b, densify=True, normalize=True, adj_dtype=None)
    want = gcn_norm_dense(to_dense(b))
    np.testing.assert_allclose(np.asarray(got.adj), np.asarray(want.adj),
                               rtol=1e-6)
    # row sums of D^-1/2 (A+I) D^-1/2 weighted by sqrt-degree recover degree
    deg = np.asarray(to_dense(b).adj.sum(-1)) + np.asarray(
        to_dense(b).mask, np.float32)
    lhs = np.asarray(want.adj) * np.sqrt(deg)[:, None, :]
    np.testing.assert_allclose(lhs.sum(-1), np.sqrt(deg), rtol=1e-5)


# ---------------------------------------------------------------------------
# topk pooler: dense branch == sparse branch (shared params)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("ratio", [0.5, 0.25, 3])
@pytest.mark.parametrize("impl", ["onehot", "gather"])
def test_topk_dense_branch_matches_sparse(ratio, impl):
    b = make_batch([11, 7, 9], num_features=6, seed=4, weighted=True,
                   pad_nodes=32, pad_edges=256)
    dense = to_dense(b)
    pooler = get_pooler("topk", in_channels=6, ratio=ratio, multiplier=1.5)
    params = pooler.init(jax.random.key(5), b)

    out_sp = pooler.apply(params, b)
    out_dn = pooler.apply(params, dense, pool_impl=impl)
    assert out_sp.graph is not None and out_dn.dense is not None

    want = _sparse_pooled_as_dense(out_sp)
    K = out_sp.graph.max_nodes
    assert out_dn.dense.max_nodes == K
    np.testing.assert_array_equal(np.asarray(out_dn.dense.mask),
                                  np.asarray(want.mask))
    np.testing.assert_allclose(np.asarray(out_dn.dense.x),
                               np.asarray(want.x), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_dn.dense.adj),
                               np.asarray(want.adj), rtol=1e-5, atol=1e-6)


def test_topk_dense_branch_min_score():
    b = make_batch([10, 8], num_features=5, seed=7, pad_nodes=24,
                   pad_edges=192)
    dense = to_dense(b)
    pooler = get_pooler("topk", in_channels=5, min_score=0.08)
    params = pooler.init(jax.random.key(2), b)
    out_sp = pooler.apply(params, b)
    out_dn = pooler.apply(params, dense)

    # same number of survivors per graph, same pooled feature mass
    n_sp = np.asarray(out_sp.graph.node_mask).reshape(
        b.num_graphs, -1).sum(-1)
    n_dn = np.asarray(out_dn.dense.mask).sum(-1)
    np.testing.assert_array_equal(n_sp, n_dn)
    want = _sparse_pooled_as_dense(out_sp)
    K = min(want.x.shape[1], out_dn.dense.x.shape[1])
    np.testing.assert_allclose(np.asarray(out_dn.dense.x)[:, :K],
                               np.asarray(want.x)[:, :K],
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("flags", [
    dict(remove_self_loops=False),
    dict(degree_norm=True),
    dict(edge_weight_norm=True),
])
def test_topk_dense_branch_postprocess_flags(flags):
    b = make_batch([9, 6], num_features=4, seed=9, weighted=True,
                   pad_nodes=16, pad_edges=128)
    dense = to_dense(b)
    pooler = get_pooler("topk", in_channels=4, ratio=0.5, **flags)
    params = pooler.init(jax.random.key(3), b)
    out_sp = pooler.apply(params, b)
    out_dn = pooler.apply(params, dense)
    want = _sparse_pooled_as_dense(out_sp)
    np.testing.assert_allclose(np.asarray(out_dn.dense.adj),
                               np.asarray(want.adj), rtol=1e-5, atol=1e-6)


def test_dense_select_output_generic_reduce_consistency():
    """The gated one-hot ``s`` must make the *generic* dense reduce agree
    with the fast pooling path, and ``out_mask`` must come from the slot
    mask (signed gates would break the ``s.sum(-2) > 0`` default)."""
    b = make_batch([8, 5], num_features=4, seed=11, pad_nodes=16,
                   pad_edges=128)
    dense = to_dense(b)
    pooler = get_pooler("topk", in_channels=4, ratio=0.5)
    params = pooler.init(jax.random.key(0), b)
    out = pooler.apply(params, dense)
    so = out.so
    assert so.is_batched_dense
    x_generic = reduce_dense_batched(dense.x, so.s)
    np.testing.assert_allclose(np.asarray(x_generic),
                               np.asarray(out.dense.x), rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(so.out_mask()),
                                  np.asarray(out.dense.mask))


def test_topk_dense_negative_gate_out_mask():
    """Nodes with negative tanh scores are still *selected*; the slot mask
    must say so even though the gate is negative."""
    x = np.array([[[-5.0], [-3.0], [-1.0], [-2.0]]], np.float32)
    adj = np.ones((1, 4, 4), np.float32) - np.eye(4, dtype=np.float32)
    dense = DenseGraphBatch(x=jnp.asarray(x), adj=jnp.asarray(adj),
                            mask=jnp.ones((1, 4), bool))
    pooler = get_pooler("topk", in_channels=1, ratio=0.5)
    params = pooler.init(jax.random.key(0), dense)
    out = pooler.apply(params, dense)
    # all scores negative -> gates negative, but 2 slots must be valid
    assert int(np.asarray(out.dense.mask).sum()) == 2
    assert np.all(np.asarray(out.so.extras["gate"])[0, :2] < 0)
    np.testing.assert_array_equal(np.asarray(out.so.out_mask()),
                                  np.asarray(out.dense.mask))


# ---------------------------------------------------------------------------
# classifier: dense pipeline == sparse pipeline with shared params
# ---------------------------------------------------------------------------


def test_pooling_classifier_dense_matches_sparse():
    b = make_batch([10, 8, 12], num_features=6, seed=13, pad_nodes=32,
                   pad_edges=256)
    pooler = get_pooler("topk", in_channels=16, ratio=0.5)
    model = PoolingClassifier(pooler=pooler, num_classes=3, hidden=16)
    params = model.init(jax.random.key(1), b)

    logits_sp, out_sp = model.apply(params, b)
    dense = prepare_batch(b, pooler=pooler)
    assert isinstance(dense, DenseGraphBatch)
    logits_dn, out_dn = model.apply(params, dense)

    # identical math, different layout: logits must agree
    np.testing.assert_allclose(np.asarray(logits_dn), np.asarray(logits_sp),
                               rtol=1e-4, atol=1e-5)
    assert out_sp.graph is not None and out_dn.dense is not None


def test_pre_normalized_layer_equivalence():
    """``prepare_batch(normalize=True)`` + ``GCNConv(normalize=False)``
    must equal in-layer normalization exactly (f32).  (At the *model* level
    pre-normalization intentionally changes the pooled-adjacency semantics
    — the pooler then pools the normalized operator, as the flagship bench
    does — so equivalence is a per-layer contract.)"""
    from tgp_tpu.mp.gcn import GCNConv

    b = make_batch([9, 7], num_features=5, seed=17, pad_nodes=24,
                   pad_edges=192, weighted=True)
    d_raw = prepare_batch(b, densify=True, normalize=False)
    d_norm = prepare_batch(b, densify=True, normalize=True, adj_dtype=None)

    c0 = GCNConv(8, normalize=True)
    c1 = GCNConv(8, normalize=False)
    params = c0.init(jax.random.key(4), d_raw)
    y0 = c0.apply(params, d_raw)
    y1 = c1.apply(params, d_norm)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=1e-5, atol=1e-6)


def test_pooling_classifier_dense_gradients_flow():
    import optax

    b = make_batch([8] * 4, num_features=6, seed=19, pad_nodes=48,
                   pad_edges=384)
    dense = prepare_batch(b, densify=True, normalize=True, adj_dtype=None)
    y = jnp.asarray([0, 1, 2, 0])
    pooler = get_pooler("topk", in_channels=12, ratio=0.5)
    model = PoolingClassifier(pooler=pooler, num_classes=3, hidden=12,
                              pre_normalized=True, fast_masks=True)
    params = model.init(jax.random.key(0), dense)

    def loss_fn(p):
        logits, _ = model.apply(p, dense)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, y).mean()

    l0, grads = jax.value_and_grad(loss_fn)(params)
    gnorm = optax.global_norm(grads)
    assert np.isfinite(float(l0)) and float(gnorm) > 0
    # selector projection receives gradient through the dense fast path
    gw = grads["params"]["pooler"]["selector"]["weight"]
    assert float(jnp.abs(gw).sum()) > 0


# ---------------------------------------------------------------------------
# pooler-capability gate (round-4 review: auto-densify must consult the
# pooler — sparse-only poolers crash on a DenseGraphBatch)
# ---------------------------------------------------------------------------


def test_prepare_batch_pooler_capability_gate():
    b = make_batch([6, 5], num_features=4, seed=0)

    # dense-capable poolers: auto still densifies
    for alias in ("topk", "mincut"):
        p = get_pooler(alias, in_channels=4, ratio=0.5, k=3)
        assert isinstance(prepare_batch(b, pooler=p), DenseGraphBatch)

    # sparse-only pooler: auto stays sparse instead of crashing in-model
    sag = get_pooler("sag", in_channels=4, ratio=0.5)
    assert prepare_batch(b, pooler=sag) is b

    # unbatched ('_u') dense-family instance runs the flat [N,K] pipeline:
    # auto must not densify for it either
    mu = get_pooler("mincut", in_channels=4, k=3, batched=False)
    assert prepare_batch(b, pooler=mu) is b

    # forcing densify for a sparse-only pooler raises up front
    with pytest.raises(ValueError, match="ACCEPTS_DENSE_BATCH"):
        prepare_batch(b, densify=True, pooler=sag)

    # handing a pre-densified batch to a sparse-only pooler raises too
    with pytest.raises(ValueError, match="DenseGraphBatch"):
        prepare_batch(to_dense(b), pooler=sag)

    # class (not instance) also accepted
    from tgp_tpu.poolers.topk import TopkPooling
    assert isinstance(prepare_batch(b, pooler=TopkPooling),
                      DenseGraphBatch)


def test_gcn_norm_dense_abs_degrees_signed_weights():
    # a node whose signed incident weights cancel must not blow up
    # (per-layer GCNConv dense normalize uses abs degrees; pre-normalize
    # must match that convention)
    adj = jnp.asarray([[[0.0, -1.0], [-1.0, 0.0]]], jnp.float32)
    d = DenseGraphBatch(x=jnp.ones((1, 2, 3)), adj=adj,
                        mask=jnp.ones((1, 2), bool))
    out = gcn_norm_dense(d, add_self_loops=True, adj_dtype=None)
    # degrees: |−1| + |1 self loop| = 2 → entries bounded by 1
    assert np.all(np.isfinite(np.asarray(out.adj)))
    assert np.max(np.abs(np.asarray(out.adj))) <= 1.0 + 1e-6


def test_bf16_adjacency_does_not_downcast_features():
    from tgp_tpu.mp.gcn import GCNConv
    b = make_batch([6, 5], num_features=4, seed=3)
    dense = prepare_batch(b, densify=True, normalize=True)  # adj bf16 default
    assert dense.adj.dtype == jnp.bfloat16
    conv = GCNConv(8, normalize=False)
    params = conv.init(jax.random.PRNGKey(0), dense, dense.x)
    out = conv.apply(params, dense, dense.x)
    # f32 features stay f32 through a bf16-adjacency layer
    assert dense.x.dtype == jnp.float32
    assert out.dtype == jnp.float32
    # and agree with the f32-adjacency result to bf16 resolution
    dense32 = prepare_batch(b, densify=True, normalize=True, adj_dtype=None)
    out32 = conv.apply(params, dense32, dense32.x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out32),
                               rtol=2e-2, atol=2e-2)
