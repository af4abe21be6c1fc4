"""SelectOutput machinery unit tests (reference: tests/selection/
test_base_select.py — cluster_to_s, S materialization, s_inv ops)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.utils_graphs import make_batch
from tgp_tpu.select.base import (
    SelectOutput,
    cluster_to_select_output,
    compact_select_output,
)


@pytest.fixture(scope="module")
def batch():
    return make_batch([6, 5], num_features=4, seed=31)


def test_cluster_to_select_output_roundtrip(batch):
    """cluster vector → SelectOutput: memberships, graphs, positions."""
    N = batch.num_nodes
    # 3 clusters in graph 0, 2 in graph 1, ids in node space
    ci = np.zeros(N, np.int64)
    ng = np.asarray(batch.node_graph)
    nm = np.asarray(batch.node_mask)
    for g in range(2):
        nodes = np.nonzero(nm & (ng == g))[0]
        for j, n in enumerate(nodes):
            ci[n] = nodes[j % (3 if g == 0 else 2)]
    so = cluster_to_select_output(jnp.asarray(ci), batch, num_clusters=N,
                                  max_clusters=batch.max_nodes)
    assert so.is_sparse
    got_ci = np.asarray(so.cluster_index)
    np.testing.assert_array_equal(got_ci[nm], ci[nm])
    # cluster_graph consistent with member nodes
    cg = np.asarray(so.cluster_graph)
    for i in np.nonzero(nm)[0]:
        assert cg[ci[i]] == ng[i]
    # out_mask marks exactly the occupied clusters
    om = np.asarray(so.out_mask())
    assert set(np.nonzero(om)[0]) == set(ci[nm])


def test_select_output_weight_and_reduce(batch):
    """Sparse SelectOutput drives reduce like S = one-hot(cluster)·weight:
    reduced features equal Σ_i w_i x_i per cluster."""
    from tgp_tpu.reduce.base import base_reduce

    N = batch.num_nodes
    nm = np.asarray(batch.node_mask)
    rng = np.random.default_rng(0)
    ci = rng.integers(0, 4, N)
    w = rng.random(N).astype(np.float32)
    so = cluster_to_select_output(jnp.asarray(ci), batch,
                                  weight=jnp.asarray(w), num_clusters=4,
                                  max_clusters=4)
    got = np.asarray(base_reduce(batch.x, so))
    xn = np.asarray(batch.x)
    for c in range(4):
        members = np.nonzero(nm & (ci == c))[0]
        expect = (xn[members] * w[members, None]).sum(0)
        np.testing.assert_allclose(got[c], expect, rtol=1e-5, atol=1e-6,
                                   err_msg=str(c))


def test_compact_select_output_shrinks(batch):
    N = batch.num_nodes
    nm = np.asarray(batch.node_mask)
    ng = np.asarray(batch.node_graph)
    # every node its own cluster (nopool-style total assignment)
    ci = np.arange(N)
    so = cluster_to_select_output(jnp.asarray(ci), batch, num_clusters=N,
                                  max_clusters=batch.max_nodes)
    budget = 8  # >= max graph size (6)
    so2 = compact_select_output(so, budget)
    assert so2.num_clusters == 2 * budget
    ci2 = np.asarray(so2.cluster_index)
    sel2 = np.asarray(so2.node_sel_mask)
    # same partition structure: nodes share a new cluster iff they shared
    # an old one (here: all distinct)
    assert len(set(ci2[sel2])) == nm.sum()
    # graph-major ids: cluster // budget == graph
    np.testing.assert_array_equal(ci2[sel2] // budget, ng[sel2])


def test_compact_select_output_overflow_masks(batch, capfd):
    """A too-small budget masks the overflow (and reports it)."""
    N = batch.num_nodes
    ci = np.arange(N)
    so = cluster_to_select_output(jnp.asarray(ci), batch, num_clusters=N,
                                  max_clusters=batch.max_nodes)
    so2 = compact_select_output(so, 3)  # graph 0 has 6 occupied clusters
    sel2 = np.asarray(so2.node_sel_mask)
    assert sel2.sum() == 3 + 3  # 3 kept per graph
    assert (np.asarray(so2.cluster_index)[sel2] < 2 * 3).all()


def test_out_mask_and_pooled_node_graph(batch):
    from tgp_tpu.poolers import get_pooler

    pooler = get_pooler("topk", in_channels=4, ratio=0.5)
    params = pooler.init(jax.random.key(0), batch)
    out = pooler.apply(params, batch)
    so = out.so
    om = np.asarray(so.out_mask())
    png = np.asarray(so.pooled_node_graph())
    K = so.max_clusters
    for g, n in enumerate([6, 5]):
        k = int(np.ceil(0.5 * n))
        assert om[g * K: (g + 1) * K].sum() == k
        assert (png[g * K: (g + 1) * K] == g).all()


def test_is_expressive_flag(batch):
    from tgp_tpu.poolers import get_pooler

    topk = get_pooler("topk", in_channels=4, ratio=0.5)
    params = topk.init(jax.random.key(0), batch)
    out = topk.apply(params, batch)
    assert not bool(out.so.is_expressive())  # partial selection drops nodes
    grac = get_pooler("graclus")
    out2 = grac(batch)
    assert bool(out2.so.is_expressive())  # total assignment keeps all
