"""Branch-coverage matrix for SelectOutput's layout dispatch
(tgp_tpu/select/base.py; VERDICT r2 #5 — masked/static-shape code hides
bugs precisely in branches).  Exercises every (sparse / batched-dense /
unbatched-dense) × (mask given / None) combination of `num_nodes`,
`out_mask`, `is_expressive`, plus the builder's optional-argument branches
and `compact_select_output`'s overflow path."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tgp_tpu.select.base import (
    SelectOutput,
    compact_select_output,
    cluster_to_select_output,
)
from tests.utils_graphs import make_batch


@pytest.fixture(scope="module")
def batch():
    return make_batch([6, 4], num_features=3, seed=1)


# ---------------------------------------------------------------------------
# dense layouts: [B, N, K] batched vs [N, K] unbatched, ± masks
# ---------------------------------------------------------------------------


def _dense_so(s, **kw):
    return SelectOutput(s=jnp.asarray(s), num_graphs=kw.pop("num_graphs", 1),
                        num_clusters=s.shape[-1],
                        max_clusters=s.shape[-1], **kw)


def test_batched_dense_properties():
    s = np.zeros((2, 4, 3), np.float32)
    s[0, :3, 0] = 1.0  # graph 0: 3 nodes → cluster 0
    s[1, :2, 1] = 1.0  # graph 1: 2 nodes → cluster 1
    in_mask = np.zeros((2, 4), bool)
    in_mask[0, :3] = True
    in_mask[1, :2] = True
    so = _dense_so(s, in_mask=jnp.asarray(in_mask), num_graphs=2)
    assert so.is_batched_dense and so.is_dense and not so.is_sparse
    assert so.num_nodes == 4
    om = np.asarray(so.out_mask())
    np.testing.assert_array_equal(om, [[True, False, False],
                                       [False, True, False]])
    assert bool(so.is_expressive())


def test_batched_dense_without_in_mask_not_expressive():
    """in_mask=None branch: padding rows count as real, so zero rows make
    the assignment non-expressive."""
    s = np.zeros((1, 4, 2), np.float32)
    s[0, :2, 0] = 1.0
    so = _dense_so(s, num_graphs=1)
    assert not bool(so.is_expressive())


def test_unbatched_dense_out_mask_segments(batch):
    """[N, K] unbatched layout: out_mask aggregates per graph through
    node_graph segments."""
    N = batch.num_nodes
    s = np.zeros((N, 3), np.float32)
    nm = np.asarray(batch.node_mask)
    ng = np.asarray(batch.node_graph)
    s[nm & (ng == 0), 0] = 1.0
    s[nm & (ng == 1), 2] = 1.0
    so = SelectOutput(s=jnp.asarray(s), node_graph=batch.node_graph,
                      node_mask=batch.node_mask, num_graphs=2,
                      num_clusters=3, max_clusters=3)
    assert not so.is_batched_dense and so.is_dense
    assert so.num_nodes == N
    om = np.asarray(so.out_mask())
    np.testing.assert_array_equal(om, [[True, False, False],
                                       [False, False, True]])
    assert bool(so.is_expressive())


def test_unbatched_dense_node_mask_none_branch():
    s = np.ones((5, 2), np.float32) / 2
    so = SelectOutput(s=jnp.asarray(s),
                      node_graph=jnp.zeros(5, jnp.int32),
                      num_graphs=1, num_clusters=2, max_clusters=2)
    assert bool(so.is_expressive())  # every row has mass, no mask given


# ---------------------------------------------------------------------------
# sparse builder: optional-argument branches
# ---------------------------------------------------------------------------


def test_builder_defaults_weight_and_sel_mask(batch):
    ci = jnp.where(batch.node_mask, batch.node_graph, 0).astype(jnp.int32)
    so = cluster_to_select_output(ci, batch, num_clusters=2, max_clusters=2)
    w = np.asarray(so.weight)
    nm = np.asarray(batch.node_mask)
    np.testing.assert_allclose(w[nm], 1.0)   # default unit weights
    np.testing.assert_allclose(w[~nm], 0.0)  # zeroed on padding
    np.testing.assert_array_equal(np.asarray(so.node_sel_mask), nm)
    # derived cluster_graph: supernode g belongs to graph g here
    np.testing.assert_array_equal(np.asarray(so.cluster_graph), [0, 1])
    assert bool(so.is_expressive())


def test_builder_explicit_sel_mask_intersects_node_mask(batch):
    nm = np.asarray(batch.node_mask)
    sel = nm.copy()
    sel[np.nonzero(nm)[0][0]] = False  # drop one valid node
    ci = jnp.where(batch.node_mask, batch.node_graph, 0).astype(jnp.int32)
    so = cluster_to_select_output(ci, batch, num_clusters=2, max_clusters=2,
                              node_sel_mask=jnp.asarray(sel), partial=True)
    assert not bool(so.is_expressive())
    assert np.asarray(so.weight)[np.nonzero(nm)[0][0]] == 0.0


def test_builder_explicit_cluster_graph_passthrough(batch):
    ci = jnp.zeros(batch.num_nodes, jnp.int32)
    cg = jnp.asarray([1], jnp.int32)  # deliberately wrong on purpose
    so = cluster_to_select_output(ci, batch, num_clusters=1, max_clusters=1,
                              cluster_graph=cg)
    np.testing.assert_array_equal(np.asarray(so.cluster_graph), [1])


# ---------------------------------------------------------------------------
# compact_select_output: normal + overflow branches
# ---------------------------------------------------------------------------


def _total_so(batch):
    # each valid node its own supernode (id = node id) — worst-case budget
    N = batch.num_nodes
    ci = jnp.arange(N, dtype=jnp.int32)
    return cluster_to_select_output(ci, batch, num_clusters=N, max_clusters=N)


def test_compact_repacks_graph_major(batch):
    so = _total_so(batch)
    out = compact_select_output(so, budget_per_graph=8)
    assert out.num_clusters == 2 * 8
    nm = np.asarray(batch.node_mask)
    ci = np.asarray(out.cluster_index)
    ng = np.asarray(batch.node_graph)
    # nodes of graph g land in [g*8, (g+1)*8)
    assert ((ci[nm] // 8) == ng[nm]).all()
    # occupied count preserved
    assert np.asarray(out.out_mask()).sum() == nm.sum()


def test_compact_overflow_masks_surplus(batch):
    """budget below a graph's occupied count: surplus supernodes (and their
    nodes) are masked out instead of silently corrupting ids."""
    so = _total_so(batch)
    out = compact_select_output(so, budget_per_graph=3)
    nm = np.asarray(batch.node_mask)
    sel = np.asarray(out.node_sel_mask)
    assert sel.sum() == 2 * 3  # 3 survivors per graph
    assert (np.asarray(out.cluster_index)[sel] < 6).all()
    assert not bool(out.is_expressive())


def test_compact_requires_sparse():
    so = SelectOutput(s=jnp.ones((1, 2, 2)), num_graphs=1, num_clusters=2,
                      max_clusters=2)
    with pytest.raises(AssertionError):
        compact_select_output(so, budget_per_graph=2)
