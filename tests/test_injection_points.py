"""Arbitrary-module injection points (VERDICT r3 #9): SAG accepts a
user-supplied scoring module (reference SAGPooling's ``GNN=`` argument,
tgp/poolers/sag.py:108-143) and AggrReduce accepts any callable / flax
module (reference AggrReduce wraps any PyG Aggregation,
tgp/reduce/aggr_reduce.py:33-156), with the alias registries kept as sugar.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from tgp_tpu.poolers import get_pooler
from tgp_tpu.poolers.sag import SAGPooling
from tgp_tpu.reduce.aggr import AggrReduce
from tests.utils_graphs import make_batch


class _MeanNeighborScore(nn.Module):
    """Toy user GNN: score = Dense(mean-neighbor features)."""

    @nn.compact
    def __call__(self, batch, x=None):
        h = x if x is not None else batch.x
        from tgp_tpu.ops.sparse import spmm

        neigh = spmm(batch.senders, batch.receivers, batch.edge_weight, h,
                     batch.num_nodes)
        deg = spmm(batch.senders, batch.receivers, batch.edge_weight,
                   jnp.ones((batch.num_nodes, 1), h.dtype), batch.num_nodes)
        return nn.Dense(1)(neigh / jnp.clip(deg, 1.0, None))


def test_sag_custom_score_gnn():
    b = make_batch([10, 8], num_features=6, seed=3, pad_nodes=24,
                   pad_edges=192)
    pooler = SAGPooling(in_channels=6, ratio=0.5,
                        score_gnn=_MeanNeighborScore())
    params = pooler.init(jax.random.key(0), b)
    out = pooler.apply(params, b)
    # the user module's params live under the pooler tree and get gradients
    assert "score_gnn" in params["params"]
    assert "Dense_0" in params["params"]["score_gnn"]

    def loss(p):
        o = pooler.apply(p, b)
        return jnp.sum(o.graph.x ** 2)

    g = jax.grad(loss)(params)
    gw = g["params"]["score_gnn"]["Dense_0"]["kernel"]
    assert float(jnp.abs(gw).sum()) > 0
    # supernode budget respected: ceil(0.5 * max_nodes)
    assert out.graph.max_nodes == 5


def test_sag_custom_gnn_via_factory():
    b = make_batch([9], num_features=4, seed=5)
    pooler = get_pooler("sag", in_channels=4, ratio=0.5,
                        score_gnn=_MeanNeighborScore())
    params = pooler.init(jax.random.key(1), b)
    out = pooler.apply(params, b)
    assert out.graph is not None


def test_sag_vector_score_output_squeezed():
    """A user module returning [N] (not [N,1]) also works."""

    class FlatScore(nn.Module):
        @nn.compact
        def __call__(self, batch, x=None):
            h = x if x is not None else batch.x
            return nn.Dense(1)(h)[:, 0]

    b = make_batch([8, 6], num_features=5, seed=7)
    pooler = SAGPooling(in_channels=5, ratio=0.5, score_gnn=FlatScore())
    params = pooler.init(jax.random.key(2), b)
    out = pooler.apply(params, b)
    assert out.graph is not None


def test_aggr_reduce_custom_callable():
    """A bare callable with the (x, seg, C, mask) contract is accepted."""
    from tgp_tpu.ops.segment import segment_sum

    def sum_of_squares(x, seg, C, mask):
        return segment_sum(x * x, seg, C, mask=mask)

    b = make_batch([6, 5], num_features=4, seed=9)
    red = AggrReduce(aggr=sum_of_squares)
    params = red.init(jax.random.key(0), b.x, None,
                      node_graph=b.node_graph, num_graphs=b.num_graphs,
                      node_mask=b.node_mask)
    got = red.apply(params, b.x, None, node_graph=b.node_graph,
                    num_graphs=b.num_graphs, node_mask=b.node_mask)
    x, m, g = (np.asarray(b.x), np.asarray(b.node_mask),
               np.asarray(b.node_graph))
    want = np.zeros((b.num_graphs, x.shape[1]), np.float32)
    for i in range(len(x)):
        if m[i]:
            want[g[i]] += x[i] ** 2
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


def test_aggr_reduce_custom_flax_module():
    """A learnable user aggregation module is a first-class reducer."""

    class GatedSum(nn.Module):
        @nn.compact
        def __call__(self, x, seg, C, mask):
            from tgp_tpu.ops.segment import segment_sum

            gate = nn.sigmoid(nn.Dense(x.shape[-1])(x))
            return segment_sum(x * gate, seg, C, mask=mask)

    b = make_batch([7, 4], num_features=4, seed=11)
    red = AggrReduce(aggr=GatedSum())
    params = red.init(jax.random.key(3), b.x, None,
                      node_graph=b.node_graph, num_graphs=b.num_graphs,
                      node_mask=b.node_mask)

    def loss(p):
        out = red.apply(p, b.x, None, node_graph=b.node_graph,
                        num_graphs=b.num_graphs, node_mask=b.node_mask)
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert leaves and all(np.isfinite(np.asarray(leaf)).all()
                          for leaf in leaves)
    assert sum(float(jnp.abs(leaf).sum()) for leaf in leaves) > 0
