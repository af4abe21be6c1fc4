"""Lift operator semantics (reference: tgp/lift/base_lift.py:17-254):
matrix_op ∈ {precomputed, transpose, inverse} × reduce_op ∈ {sum, mean, max}."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tgp_tpu.graph import from_graphs, to_dense
from tgp_tpu.lift.base import (
    base_lift,
    lift_dense_batched,
    lift_dense_unbatched,
    lift_sparse,
)
from tgp_tpu.poolers import get_pooler
from tgp_tpu.select.base import SelectOutput, cluster_to_select_output
from tests.utils_graphs import make_batch


def _dense_so(seed=0, B=2, N=6, K=3, mask_last=True):
    rng = np.random.default_rng(seed)
    s = rng.uniform(size=(B, N, K))
    s = s / s.sum(-1, keepdims=True)
    mask = np.ones((B, N), bool)
    if mask_last:
        mask[:, -2:] = False
        s = s * mask[..., None]
    return SelectOutput(
        s=jnp.asarray(s, jnp.float32), in_mask=jnp.asarray(mask),
        num_clusters=K, num_graphs=B, max_clusters=K), s, mask


def test_dense_inverse_lift_matches_numpy_pinv():
    so, s, mask = _dense_so()
    rng = np.random.default_rng(1)
    xp = rng.normal(size=(2, 3, 4)).astype(np.float32)
    out = lift_dense_batched(jnp.asarray(xp), so, matrix_op="inverse")
    ref = np.einsum("bnk,bkf->bnf",
                    np.transpose(np.linalg.pinv(s), (0, 2, 1)), xp)
    ref = ref * mask[..., None]
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_dense_precomputed_honors_s_inv_op():
    so, s, mask = _dense_so()
    xp = jnp.asarray(np.random.default_rng(2).normal(size=(2, 3, 4)),
                     jnp.float32)
    # s_inv_op='transpose' (default): precomputed == transpose
    a = lift_dense_batched(xp, so, matrix_op="precomputed")
    b = lift_dense_batched(xp, so, matrix_op="transpose")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # s_inv_op='inverse': precomputed == inverse
    so_inv = so.replace(s_inv_op="inverse")
    a = lift_dense_batched(xp, so_inv, matrix_op="precomputed")
    b = lift_dense_batched(xp, so_inv, matrix_op="inverse")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("reduce_op", ["sum", "mean", "max"])
def test_dense_reduce_ops_match_numpy(reduce_op):
    so, s, mask = _dense_so()
    rng = np.random.default_rng(3)
    xp = rng.normal(size=(2, 3, 4)).astype(np.float32)
    out = np.asarray(lift_dense_batched(jnp.asarray(xp), so,
                                        matrix_op="transpose",
                                        reduce_op=reduce_op))
    contrib = s[..., None] * xp[:, None, :, :]  # [B, N, K, F]
    if reduce_op == "sum":
        ref = contrib.sum(2)
    elif reduce_op == "mean":
        cnt = np.maximum((s != 0).sum(-1), 1)
        ref = contrib.sum(2) / cnt[..., None]
    else:
        c = np.where((s != 0)[..., None], contrib, -np.inf)
        ref = np.where(np.isfinite(c.max(2)), c.max(2), 0.0)
    ref = ref * mask[..., None]
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_sparse_inverse_closed_form_matches_pinv():
    # single-membership sparse S: pinv closed form w_i / sum_j w_j^2
    N, C = 10, 4
    rng = np.random.default_rng(4)
    ci = rng.integers(0, C, N)
    w = rng.uniform(0.5, 2.0, N).astype(np.float32)
    so = SelectOutput(
        cluster_index=jnp.asarray(ci, jnp.int32), weight=jnp.asarray(w),
        node_sel_mask=jnp.ones(N, bool),
        node_graph=jnp.zeros(N, jnp.int32), node_mask=jnp.ones(N, bool),
        cluster_graph=jnp.zeros(C, jnp.int32),
        cluster_pos=jnp.arange(C, dtype=jnp.int32),
        num_clusters=C, num_graphs=1, max_clusters=C, partial=False)
    xp = rng.normal(size=(C, 5)).astype(np.float32)
    out = np.asarray(lift_sparse(jnp.asarray(xp), so, matrix_op="inverse"))
    S = np.zeros((N, C))
    S[np.arange(N), ci] = w
    ref = np.linalg.pinv(S).T @ xp
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_pooler_lift_op_field_plumbs_through():
    b = make_batch([8, 6], num_features=5, seed=0, pad_nodes=16,
                   pad_edges=128)
    pooler = get_pooler("topk", in_channels=5, ratio=0.5, lift_op="inverse")
    params = pooler.init(jax.random.key(0), b)
    out = pooler.apply(params, b)
    lifted = pooler.apply(params, b, so=out.so, lifting=True,
                          x=out.graph.x)
    assert lifted.shape == b.x.shape
    # inverse lift rescales by w/sum w^2 per cluster; with one node per
    # cluster (topk) that's 1/w — lifting a just-reduced x recovers x on
    # selected nodes
    sel = np.asarray(out.so.node_sel_mask)
    np.testing.assert_allclose(np.asarray(lifted)[sel],
                               np.asarray(b.x)[sel], rtol=1e-4, atol=1e-5)


def test_mincut_lift_roundtrip_inverse_projects():
    b = make_batch([8, 6], num_features=5, seed=1, pad_nodes=16,
                   pad_edges=128)
    pooler = get_pooler("mincut", in_channels=5, k=3, lift_op="inverse")
    params = pooler.init(jax.random.key(0), b)
    out = pooler.apply(params, b)
    lifted = pooler.apply(params, b, so=out.so, lifting=True, x=out.dense.x)
    # S pinv lift of S^T x is the projection of x onto col(S) — re-pooling
    # the lifted features must reproduce the pooled features exactly
    repooled = np.einsum("bnk,bnf->bkf", np.asarray(out.so.s),
                         np.asarray(lifted))
    np.testing.assert_allclose(repooled, np.asarray(out.dense.x),
                               rtol=1e-3, atol=1e-4)


def test_pinv_lift_rank_deficient_s_finite():
    """Moore-Penrose lift of a rank-deficient S (every node in one cluster)
    stays finite — jnp.linalg.pinv handles the zero singular values."""
    from tgp_tpu.lift.base import lift_dense_batched
    from tgp_tpu.select.base import SelectOutput, cluster_to_select_output

    S = jnp.zeros((2, 6, 3)).at[:, :, 0].set(1.0)
    so = SelectOutput(s=S, num_clusters=3, num_graphs=2, s_inv_op="inverse")
    out = lift_dense_batched(jnp.ones((2, 3, 4)), so, matrix_op="precomputed")
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("matrix_op", ["precomputed", "transpose", "inverse"])
@pytest.mark.parametrize("reduce_op", ["sum", "mean", "max"])
def test_full_lift_matrix_lattice(matrix_op, reduce_op):
    """Every matrix_op × reduce_op cell runs and, for a hard assignment,
    sum == mean == max (one entry per node — reference _lift_sparse
    semantics, base_lift.py:102-111)."""
    b = make_batch([6, 5], num_features=3, seed=8)
    ci = jnp.where(b.node_mask, b.node_graph, 0).astype(jnp.int32)
    so = cluster_to_select_output(ci, b, num_clusters=2, max_clusters=2)
    x_pool = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 3)).astype(np.float32))
    out = base_lift(x_pool, so, matrix_op=matrix_op, reduce_op=reduce_op)
    assert out.shape == (b.num_nodes, 3)
    assert np.isfinite(np.asarray(out)).all()
    if matrix_op == "transpose":
        # hard unit-weight assignment → lift = broadcast of cluster row
        want = np.asarray(x_pool)[np.asarray(ci)]
        want[~np.asarray(b.node_mask)] = 0.0
        got = np.asarray(out) * np.asarray(b.node_mask)[:, None]
        np.testing.assert_allclose(got, want, rtol=1e-5)


def test_lift_reduce_ops_agree_on_hard_assignment():
    b = make_batch([6, 5], num_features=3, seed=8)
    ci = jnp.where(b.node_mask, b.node_graph, 0).astype(jnp.int32)
    so = cluster_to_select_output(ci, b, num_clusters=2, max_clusters=2)
    x_pool = jnp.ones((2, 3))
    outs = [np.asarray(base_lift(x_pool, so, matrix_op="transpose",
                                 reduce_op=op)) for op in ("sum", "mean",
                                                           "max")]
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-6)
    np.testing.assert_allclose(outs[0], outs[2], rtol=1e-6)


def test_lift_invalid_matrix_op_raises():
    b = make_batch([4], num_features=3, seed=0)
    ci = jnp.zeros(b.num_nodes, jnp.int32)
    so = cluster_to_select_output(ci, b, num_clusters=1, max_clusters=1)
    with pytest.raises(ValueError, match="matrix_op"):
        base_lift(jnp.ones((1, 3)), so, matrix_op="bogus")
