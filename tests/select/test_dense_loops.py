"""Dense (scatter-free) matching/MIS loops must agree exactly with the
sparse while-loop originals (reference semantics:
tgp/select/edge_contraction_select.py:14-110, tgp/select/kmis_select.py:35-388)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.utils_graphs import erdos_renyi_graph
from tgp_tpu.data.loaders import GraphLoader
from tgp_tpu.select.edge_contraction import (
    maximal_matching,
    maximal_matching_dense,
)
from tgp_tpu.select.kmis import (
    maximal_independent_set,
    maximal_independent_set_dense,
    mis_cluster,
    mis_cluster_dense,
)


def _batch(seed=0, sizes=(17, 30, 24, 30)):
    graphs = [erdos_renyi_graph(n, p=0.15, num_features=4, seed=seed + i)
              for i, n in enumerate(sizes)]
    return next(iter(GraphLoader(graphs, batch_size=len(graphs))))


def _rank(batch, seed=0):
    E = batch.num_edges
    w = jax.random.uniform(jax.random.key(seed), (E,))
    order = jnp.lexsort((-w, ~batch.edge_mask))
    return jnp.zeros(E, jnp.int32).at[order].set(jnp.arange(E, dtype=jnp.int32))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_matching_dense_equals_sparse(seed):
    b = _batch(seed)
    rank = _rank(b, seed)
    m_sparse = maximal_matching(rank, b.senders, b.receivers, b.edge_mask,
                                b.num_nodes)
    m_dense = maximal_matching_dense(rank, b.senders, b.receivers,
                                     b.edge_mask, b.node_graph, b.node_pos,
                                     b.num_graphs, b.max_nodes)
    np.testing.assert_array_equal(np.asarray(m_sparse), np.asarray(m_dense))


def test_matching_dense_last_graph_full():
    # padding rows alias cell [B-1, Nm-1]; a full last graph must not be
    # corrupted by the padding scatter
    b = _batch(3, sizes=(10, 28, 28))
    assert int(b.nodes_per_graph()[-1]) == b.max_nodes
    rank = _rank(b, 3)
    m_sparse = maximal_matching(rank, b.senders, b.receivers, b.edge_mask,
                                b.num_nodes)
    m_dense = maximal_matching_dense(rank, b.senders, b.receivers,
                                     b.edge_mask, b.node_graph, b.node_pos,
                                     b.num_graphs, b.max_nodes)
    np.testing.assert_array_equal(np.asarray(m_sparse), np.asarray(m_dense))


@pytest.mark.parametrize("order_k", [1, 2])
def test_mis_dense_equals_sparse(order_k):
    b = _batch(7)
    N = b.num_nodes
    rank = jnp.zeros(N, jnp.int32).at[
        jnp.lexsort((jnp.arange(N), ~b.node_mask))].set(
        jnp.arange(N, dtype=jnp.int32))
    mis_s = maximal_independent_set(rank, b.senders, b.receivers,
                                    b.edge_mask, b.node_mask, order_k)
    mis_d = maximal_independent_set_dense(rank, b, order_k)
    np.testing.assert_array_equal(np.asarray(mis_s), np.asarray(mis_d))
    c_s = mis_cluster(mis_s, rank, b.senders, b.receivers, b.edge_mask,
                      b.node_mask, order_k)
    c_d = mis_cluster_dense(mis_d, rank, b, order_k)
    nm = np.asarray(b.node_mask)  # padding rows may legitimately differ
    np.testing.assert_array_equal(np.asarray(c_s)[nm], np.asarray(c_d)[nm])


def test_pooler_impl_knobs_agree():
    from tgp_tpu.select.graclus import graclus_select

    b = _batch(11)
    sd = graclus_select(b, matching_impl="dense")
    ss = graclus_select(b, matching_impl="sparse")
    np.testing.assert_array_equal(np.asarray(sd.cluster_index),
                                  np.asarray(ss.cluster_index))


def test_maxcut_scorenet_dense_equals_sparse():
    from tgp_tpu.select.maxcut import MaxCutScoreNet

    b = _batch(13)
    net_d = MaxCutScoreNet(in_channels=8, mp_units=(8, 8), mp_impl="dense")
    net_s = MaxCutScoreNet(in_channels=8, mp_units=(8, 8), mp_impl="sparse")
    params = net_d.init(jax.random.key(0), b)
    sd = net_d.apply(params, b)
    ss = net_s.apply(params, b)
    nm = np.asarray(b.node_mask)
    np.testing.assert_allclose(np.asarray(sd)[nm], np.asarray(ss)[nm],
                               rtol=2e-5, atol=2e-5)
