"""Topk knob branches and readout edge cases (reference:
tests/poolers/test_topk.py, tests/reduce/test_global_reduce.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tgp_tpu.poolers import get_pooler
from tgp_tpu.reduce.global_reduce import global_reduce
from tests.utils_graphs import make_batch


@pytest.fixture(scope="module")
def batch():
    return make_batch([9, 6, 12], num_features=6, seed=4, weighted=True,
                      pad_nodes=32, pad_edges=160)


@pytest.mark.parametrize("act", ["tanh", "sigmoid", None])
def test_topk_act_variants(batch, act):
    pooler = get_pooler("topk", in_channels=6, ratio=0.5, act=act)
    params = pooler.init(jax.random.key(0), batch)
    out = pooler.apply(params, batch)
    assert np.isfinite(np.asarray(out.graph.x)).all()
    w = np.asarray(out.so.weight)
    nm = np.asarray(out.so.node_sel_mask)
    if act == "sigmoid":
        assert (w[nm] > 0).all() and (w[nm] < 1).all()
    elif act == "tanh":
        assert (np.abs(w[nm]) < 1).all()


def test_topk_multiplier_scales_features(batch):
    p1 = get_pooler("topk", in_channels=6, ratio=0.5, multiplier=1.0)
    params = p1.init(jax.random.key(0), batch)
    x1 = np.asarray(p1.apply(params, batch).graph.x)
    p2 = get_pooler("topk", in_channels=6, ratio=0.5, multiplier=2.0)
    x2 = np.asarray(p2.apply(params, batch).graph.x)
    np.testing.assert_allclose(x2, 2 * x1, rtol=1e-6)


def test_topk_min_score_softmax_scores_sum_to_one(batch):
    """min_score mode scores via per-graph softmax
    (reference topk_select.py:169-207): kept weights are softmax values."""
    pooler = get_pooler("topk", in_channels=6, min_score=0.05)
    params = pooler.init(jax.random.key(0), batch)
    so = pooler.apply(params, batch).so
    w = np.asarray(so.weight)
    ng = np.asarray(so.node_graph)
    nm = np.asarray(so.node_mask)
    # per-graph softmax over ALL valid nodes sums to 1; the kept subset
    # sums to ≤ 1 and every kept weight clears the threshold rule
    sel = np.asarray(so.node_sel_mask)
    for g in range(batch.num_graphs):
        kept = w[sel & (ng == g)]
        assert kept.size >= 1  # threshold is clamped below the per-graph max
        assert kept.sum() <= 1.0 + 1e-5


def test_global_reduce_all_masked_graph_keeps_batch_row():
    """A graph whose mask is all-False still yields a (zero / neutral)
    readout row — batch size is preserved (reference
    test_readout_dense_mask_all_false_preserves_batch_size)."""
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 5, 3)).astype(np.float32))
    mask = jnp.asarray([[True, True, False, False, False],
                        [False, False, False, False, False]])
    for op in ("sum", "mean", "max", "min"):
        z = global_reduce(x, mask=mask, op=op)
        assert z.shape == (2, 3)
        assert np.isfinite(np.asarray(z)).all(), op
    np.testing.assert_allclose(
        np.asarray(global_reduce(x, mask=mask, op="sum"))[1], 0.0)


def test_global_reduce_sparse_single_graph():
    x = jnp.asarray(np.random.default_rng(1).normal(
        size=(7, 3)).astype(np.float32))
    ng = jnp.zeros(7, jnp.int32)
    z = global_reduce(x, node_graph=ng, num_graphs=1, op="mean")
    np.testing.assert_allclose(np.asarray(z)[0], np.asarray(x).mean(0),
                               rtol=1e-5)


def test_aggr_readout_mode(batch):
    """AggrReduce with so=None acts as a one-supernode-per-graph readout
    (reference aggr_reduce.py:33-156)."""
    from tgp_tpu.reduce.aggr import AggrReduce

    red = AggrReduce(aggr="mean")
    z = red.apply({}, batch.x, None, node_graph=batch.node_graph,
                  num_graphs=batch.num_graphs, node_mask=batch.node_mask)
    assert z.shape == (batch.num_graphs, batch.num_features)
    x = np.asarray(batch.x)
    nm = np.asarray(batch.node_mask)
    ng = np.asarray(batch.node_graph)
    for g in range(batch.num_graphs):
        np.testing.assert_allclose(np.asarray(z)[g],
                                   x[nm & (ng == g)].mean(0), rtol=1e-5)


@pytest.mark.parametrize("kind", ["graph_conv", "gcn", "le"])
def test_sag_gnn_kind_variants(batch, kind):
    """SAG's scoring GNN is selectable (reference SAGPooling GNN= arg)."""
    pooler = get_pooler("sag", in_channels=6, ratio=0.5, gnn_kind=kind)
    params = pooler.init(jax.random.key(0), batch)
    out = pooler.apply(params, batch)
    counts = np.asarray(out.graph.nodes_per_graph())
    expect = np.ceil(0.5 * np.asarray(batch.nodes_per_graph())).astype(int)
    np.testing.assert_array_equal(counts, expect)
    assert np.isfinite(np.asarray(out.graph.x)).all()


def test_sag_invalid_gnn_kind(batch):
    pooler = get_pooler("sag", in_channels=6, gnn_kind="bogus")
    with pytest.raises(ValueError, match="gnn_kind"):
        pooler.init(jax.random.key(0), batch)


@pytest.mark.parametrize("intra", [None, "graph_conv", "gcn"])
def test_asap_intra_gnn_variants(batch, intra):
    """ASAP's optional intra-cluster GNN (reference GNN= arg)."""
    pooler = get_pooler("asap", in_channels=6, ratio=0.5, intra_gnn=intra)
    params = pooler.init(jax.random.key(0), batch)
    out = pooler.apply(params, batch)
    counts = np.asarray(out.graph.nodes_per_graph())
    expect = np.ceil(0.5 * np.asarray(batch.nodes_per_graph())).astype(int)
    np.testing.assert_array_equal(counts, expect)
    assert np.isfinite(np.asarray(out.graph.x)).all()


def test_factory_translates_reference_arg_spellings(batch):
    """Migrating code may use the reference's arg names: ``lift=`` and
    topk's ``nonlinearity=`` must reach our `lift_op`/`act` fields instead
    of being silently filtered."""
    p = get_pooler("topk", in_channels=6, ratio=0.5, lift="inverse",
                   nonlinearity="sigmoid")
    assert p.lift_op == "inverse"
    assert p.act == "sigmoid"
    # asap spells it nonlinearity natively — no translation
    p2 = get_pooler("asap", in_channels=6, nonlinearity="tanh")
    assert p2.nonlinearity == "tanh"


def test_maxcut_assign_all_nodes_false_partial(batch):
    """assign_all_nodes=False keeps a partial top-k selection (reference
    maxcut.py semantics)."""
    pooler = get_pooler("maxcut", in_channels=6, ratio=0.5,
                        assign_all_nodes=False)
    params = pooler.init(jax.random.key(0), batch)
    so = pooler.apply(params, batch).so
    nm = np.asarray(so.node_mask)
    sel = np.asarray(so.node_sel_mask)
    assert sel[nm].sum() < nm.sum()  # strictly partial
    assert so.partial


def test_asap_no_self_loops_runs(batch):
    pooler = get_pooler("asap", in_channels=6, ratio=0.5,
                        add_self_loops=False)
    params = pooler.init(jax.random.key(0), batch)
    out = pooler.apply(params, batch)
    assert np.isfinite(np.asarray(out.graph.x)).all()


def test_eigen_unnormalized_laplacian():
    from tgp_tpu.precoarsen.eigenpool import eigenpool_level
    from tests.utils_graphs import erdos_renyi_graph

    x, ei = erdos_renyi_graph(12, p=0.4, num_features=4, seed=2)
    a = eigenpool_level(ei, 12, k=3, num_modes=2, normalized=True)
    b = eigenpool_level(ei, 12, k=3, num_modes=2, normalized=False)
    assert not np.allclose(np.asarray(a["theta"]), np.asarray(b["theta"]))
    assert np.isfinite(np.asarray(b["theta"])).all()


def test_kmis_force_undirected_directed_chain():
    """A purely forward-directed chain: without symmetrization the MIS
    independence/domination only sees forward edges; with
    force_undirected=True (reference to_undirected(reduce='max')) the MIS
    respects both directions."""
    from tgp_tpu.graph import from_graphs

    n = 7
    s = np.arange(n - 1)
    ei = np.stack([s, s + 1])  # forward only
    x = np.random.default_rng(0).normal(size=(n, 6)).astype(np.float32)
    b = from_graphs([(x, ei)])
    pooler = get_pooler("kmis", in_channels=6, scorer="constant",
                        force_undirected=True)
    params = pooler.init(jax.random.key(0), b)
    out = pooler.apply(params, b)
    mis = np.asarray(out.so.extras["mis"])[: n]
    # undirected chain: no two adjacent nodes both in the MIS, every
    # non-member has a member neighbor (either direction)
    for i in range(n - 1):
        assert not (mis[i] and mis[i + 1])
    for i in range(n):
        if not mis[i]:
            assert (i > 0 and mis[i - 1]) or (i < n - 1 and mis[i + 1])
