"""SRC plumbing unit tests with dummy components (reference:
tests/test_src.py:16-300 — unit-testing SRCPooling's dispatch itself)."""

import jax
import jax.numpy as jnp
import numpy as np

from tgp_tpu.connect.base import ConnectConfig, sparse_connect
from tgp_tpu.lift.base import base_lift
from tgp_tpu.reduce.base import base_reduce
from tgp_tpu.select.base import SelectOutput, cluster_to_select_output
from tgp_tpu.src import PoolingOutput
from tests.utils_graphs import make_batch


def _dummy_so(batch, k_per_graph=2):
    """Assign node i to supernode (graph, i mod k)."""
    ci = batch.node_graph * k_per_graph + (
        jnp.arange(batch.num_nodes) % k_per_graph)
    return cluster_to_select_output(
        ci, batch, num_clusters=batch.num_graphs * k_per_graph,
        max_clusters=k_per_graph)


def test_cluster_to_select_output_basics(small_batch):
    so = _dummy_so(small_batch)
    assert so.is_sparse and not so.is_dense
    om = np.asarray(so.out_mask())
    assert om.sum() == small_batch.num_graphs * 2  # all slots occupied
    cg = np.asarray(so.cluster_graph)
    np.testing.assert_array_equal(cg[:6], [0, 0, 1, 1, 2, 2])
    # cluster_pos compact per graph
    cp = np.asarray(so.cluster_pos)
    assert set(cp[:2]) == {0, 1}


def test_reduce_then_lift_roundtrip_shapes(small_batch):
    so = _dummy_so(small_batch)
    x_pool = base_reduce(small_batch.x, so)
    assert x_pool.shape == (so.num_clusters, small_batch.num_features)
    x_lift = base_lift(x_pool, so)
    assert x_lift.shape == small_batch.x.shape
    # oracle: x_pool[c] = sum of members
    ci = np.asarray(so.cluster_index)
    sel = np.asarray(so.node_sel_mask)
    xn = np.asarray(small_batch.x)
    for c in range(so.num_clusters):
        members = np.nonzero((ci == c) & sel)[0]
        np.testing.assert_allclose(np.asarray(x_pool)[c],
                                   xn[members].sum(0), rtol=1e-4, atol=1e-4)


def test_connect_total_assignment_coalesces(small_batch):
    so = _dummy_so(small_batch)
    s, r, w, m = sparse_connect(
        small_batch.senders, small_batch.receivers, small_batch.edge_weight,
        small_batch.edge_mask, so, ConnectConfig(remove_self_loops=True))
    sn, rn, wn, mn = map(np.asarray, (s, r, w, m))
    # no duplicate pairs among valid slots, no self loops
    pairs = set()
    for e in np.nonzero(mn)[0]:
        assert sn[e] != rn[e]
        assert (sn[e], rn[e]) not in pairs
        pairs.add((sn[e], rn[e]))
    # weight conservation: sum of valid pooled weights equals sum of
    # original inter-cluster weights
    ci = np.asarray(so.cluster_index)
    orig = 0.0
    for e in np.nonzero(np.asarray(small_batch.edge_mask))[0]:
        a = ci[np.asarray(small_batch.senders)[e]]
        b = ci[np.asarray(small_batch.receivers)[e]]
        if a != b:
            orig += np.asarray(small_batch.edge_weight)[e]
    np.testing.assert_allclose(wn[mn].sum(), orig, rtol=1e-5)


def test_pooling_output_api(small_batch):
    so = _dummy_so(small_batch)
    out = PoolingOutput(so=so, graph=small_batch,
                        loss={"a": jnp.asarray(1.5), "b": jnp.asarray(0.5)})
    assert out.has_loss
    assert float(out.get_loss_value("a")) == 1.5
    assert float(out.loss_sum()) == 2.0
    assert out.x is small_batch.x
    out2 = PoolingOutput(so=so, graph=small_batch)
    assert not out2.has_loss
    assert float(out2.loss_sum()) == 0.0


def test_compact_select_output(small_batch):
    from tgp_tpu.select.base import compact_select_output
    from tgp_tpu.select.graclus import graclus_select

    so = graclus_select(small_batch)
    assert so.num_clusters == small_batch.num_nodes  # node-id space
    budget = small_batch.max_nodes  # safe upper bound
    so_c = compact_select_output(so, budget)
    assert so_c.num_clusters == small_batch.num_graphs * budget
    # same partition structure: same number of occupied clusters per graph
    import numpy as np
    om_old = np.asarray(so.out_mask())
    om_new = np.asarray(so_c.out_mask())
    cg_old = np.asarray(so.cluster_graph)
    cg_new = np.asarray(so_c.cluster_graph)
    for g in range(small_batch.num_graphs):
        assert om_old[cg_old == g].sum() == om_new[cg_new == g].sum()
    # co-membership preserved
    ci_old = np.asarray(so.cluster_index)
    ci_new = np.asarray(so_c.cluster_index)
    sel = np.asarray(so.node_sel_mask)
    idx = np.nonzero(sel)[0]
    for i in idx[:20]:
        for j in idx[:20]:
            assert ((ci_old[i] == ci_old[j]) == (ci_new[i] == ci_new[j]))


def test_is_expressive(small_batch):
    from tgp_tpu.select import degree_scorer
    from tgp_tpu.select.graclus import graclus_select
    from tgp_tpu.select.topk import topk_select_from_scores

    score = degree_scorer(small_batch)
    assert score.shape == (small_batch.num_nodes,)
    so_partial = topk_select_from_scores(score, small_batch, 0.5)
    assert not bool(so_partial.is_expressive())
    so_total = graclus_select(small_batch)
    assert bool(so_total.is_expressive())
