"""SRC-operator-layer review regressions: AggrReduce readout mask guard,
LaPool zero-leader NaN gradients, is_expressive signed gates, MaxCut
in_channels inference, EdgeContraction in_channels contract."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tgp_tpu.graph import from_graphs


def _chain(n, f=4, seed=0):
    rng = np.random.default_rng(seed)
    src = np.arange(n - 1)
    ei = np.stack([np.concatenate([src, src + 1]),
                   np.concatenate([src + 1, src])])
    return rng.standard_normal((n, f)).astype(np.float32), ei


@pytest.mark.parametrize("aggr", ["mul", "median", "quantile", "lstm",
                                  "sort", "set2set"])
def test_aggr_readout_mode_without_node_mask(aggr):
    """so=None readout with node_mask omitted must not crash for mask-
    subscripting aggregations."""
    from tgp_tpu.reduce.aggr import AggrReduce

    x = jnp.asarray(np.random.default_rng(0).standard_normal((10, 4)),
                    jnp.float32)
    seg = jnp.asarray([0] * 5 + [1] * 5)
    red = AggrReduce(aggr=aggr)
    params = red.init(jax.random.PRNGKey(0), x, None, node_graph=seg,
                      num_graphs=2)
    out = red.apply(params, x, None, node_graph=seg, num_graphs=2)
    assert out.shape[0] == 2
    assert np.isfinite(np.asarray(out)).all()


def test_aggr_readout_mul_matches_oracle():
    from tgp_tpu.reduce.aggr import AggrReduce

    x = jnp.asarray([[2.0], [-3.0], [0.5], [4.0]])
    seg = jnp.asarray([0, 0, 1, 1])
    red = AggrReduce(aggr="mul")
    params = red.init(jax.random.PRNGKey(0), x, None, node_graph=seg,
                      num_graphs=2)
    out = np.asarray(red.apply(params, x, None, node_graph=seg,
                               num_graphs=2))
    np.testing.assert_allclose(out[:, 0], [-6.0, 2.0], rtol=1e-5)


def test_lapool_zero_leader_graph_finite_grads():
    """A batch whose padding graph has zero leaders must keep gradients
    finite through lapool_select (all-(-inf) softmax row is NaN in vjp)."""
    from tgp_tpu.reduce.base import base_reduce
    from tgp_tpu.select.lapool import lapool_select

    x, ei = _chain(6)
    empty = (np.zeros((0, 4), np.float32), np.zeros((2, 0), np.int64))
    batch = from_graphs([(x, ei), empty])  # graph 1 has zero leaders

    def f(feats):
        b = batch.replace(x=feats)
        so = lapool_select(b)
        xp = base_reduce(b.x, so)
        return jnp.sum(xp ** 2)

    g = jax.grad(f)(batch.x)
    assert np.isfinite(np.asarray(g)).all()


def test_is_expressive_with_negative_score_gates():
    """Dense top-k layout stores signed gates; a selected node with a
    negative score still participates."""
    from tgp_tpu.select.base import SelectOutput

    s = jnp.asarray([[[0.5, 0.0, 0.0],
                      [0.0, -0.7, 0.0],
                      [0.0, 0.0, 0.3]]])
    so = SelectOutput(s=s, in_mask=jnp.ones((1, 3), bool),
                      num_clusters=3, num_graphs=1, max_clusters=3)
    assert bool(so.is_expressive())


def test_maxcut_default_in_channels_learns_distinct_scores():
    """in_channels=0 default must infer the input width, not emit a
    zero-width tensor with constant bias-only scores."""
    from tgp_tpu.select.maxcut import MaxCutScoreNet

    x, ei = _chain(8, f=5, seed=3)
    batch = from_graphs([(x, ei)])
    net = MaxCutScoreNet()
    params = net.init(jax.random.PRNGKey(0), batch)
    scores = np.asarray(net.apply(params, batch))[: 8]
    assert np.unique(np.round(scores, 6)).size > 1
    # and gradients w.r.t. features are nonzero
    g = jax.grad(lambda feats: jnp.sum(
        net.apply(params, batch.replace(x=feats)) ** 2))(batch.x)
    assert np.abs(np.asarray(g)).max() > 0


def test_edge_contraction_in_channels_contract():
    from tgp_tpu.select.edge_contraction import EdgeContractionSelect

    x, ei = _chain(6)
    batch = from_graphs([(x, ei)])
    sel = EdgeContractionSelect(in_channels=7)  # wrong width declared
    with pytest.raises(ValueError, match="in_channels=7"):
        sel.init(jax.random.PRNGKey(0), batch)
    # in_channels=0 skips the check
    sel0 = EdgeContractionSelect()
    params = sel0.init(jax.random.PRNGKey(0), batch)
    so = sel0.apply(params, batch)
    assert so.cluster_index.shape[0] == batch.num_nodes
