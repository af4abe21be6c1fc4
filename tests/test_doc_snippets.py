"""The tutorial code paths stay runnable (docs/tutorials/*.md — the
reference ships executable notebook tutorials; this is our CI equivalent:
every import and call the tutorials show must keep working)."""

import numpy as np
import pytest


def test_quick_start_snippets():
    import jax

    from tgp_tpu.graph import from_graphs
    from tgp_tpu.poolers import get_pooler, pooler_map

    assert len(pooler_map()) >= 21
    x = np.random.default_rng(0).normal(size=(8, 16)).astype(np.float32)
    ei = np.array([[0, 1, 2, 3], [1, 0, 3, 2]])
    batch = from_graphs([(x, ei)] * 4)
    assert int(np.asarray(batch.node_mask).sum()) == 32

    pool = get_pooler("topk", in_channels=16, ratio=0.5)
    params = pool.init(jax.random.key(0), batch)
    out = pool.apply(params, batch)
    assert np.isfinite(float(out.loss_sum()))

    x_hat = pool.apply(params, batch, so=out.so, x=out.x, lifting=True)
    assert x_hat.shape[0] == batch.num_nodes

    out2 = pool.apply(params, batch, so=out.so)  # cached selection
    np.testing.assert_array_equal(np.asarray(out.so.node_sel_mask),
                                  np.asarray(out2.so.node_sel_mask))


def test_hierarchical_imports():
    from tgp_tpu.connect import dense_connect, sparse_connect  # noqa: F401
    from tgp_tpu.lift import base_lift  # noqa: F401
    from tgp_tpu.reduce import base_reduce, global_reduce  # noqa: F401
    from tgp_tpu.reduce.aggr import get_aggr  # noqa: F401
    from tgp_tpu.select import (  # noqa: F401
        TopkSelect,
        topk_select_from_scores,
    )
    from tgp_tpu.select.base import (  # noqa: F401
        cluster_to_select_output,
        compact_select_output,
    )


def test_precoarsening_snippets():
    from tgp_tpu.precoarsen.api import PreCoarsening, precoarsen_graph

    rng = np.random.default_rng(1)
    n = 12
    upper = np.triu(rng.random((n, n)) < 0.4, k=1)
    adj = upper | upper.T
    s, r = np.nonzero(adj)
    ei = np.stack([s, r])
    levels = precoarsen_graph("graclus", ei, n, levels=2)
    assert len(levels) == 2

    pc = PreCoarsening(poolers="graclus", levels=2)
    x = rng.normal(size=(n, 3)).astype(np.float32)
    out = pc((x, ei))
    assert len(out[-1]) == 2


def test_advanced_snippets():
    import jax

    from tgp_tpu.models.inference import Predictor
    from tgp_tpu.ops.sparse import spmm, use_pallas_spmm  # noqa: F401

    rng = np.random.default_rng(2)

    def apply_fn(params, batch):
        return jax.ops.segment_sum(batch.x, batch.node_graph,
                                   num_segments=batch.num_graphs)

    pred = Predictor(apply_fn, params={}, batch_size=2)
    graphs = [(rng.normal(size=(n, 3)).astype(np.float32),
               np.array([[0, 1], [1, 0]])) for n in (3, 5, 4)]
    out = pred(graphs)
    assert out.shape[0] == 3
    assert pred.num_compiled >= 1
