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


def test_readme_loader_and_serving_flow():
    """README/tutorial serving flow: BucketedGraphLoader for training,
    Predictor for inference — the two halves share budgets."""
    import jax

    from tgp_tpu.data.loaders import BucketedGraphLoader

    rng = np.random.default_rng(0)
    graphs, ys = [], []
    for i in range(12):
        n = int(rng.integers(4, 12))
        ei = np.array([[j, (j + 1) % n] for j in range(n)]).T
        graphs.append((rng.normal(size=(n, 3)).astype(np.float32), ei))
        ys.append(i % 2)
    ld = BucketedGraphLoader(graphs, labels=np.asarray(ys), batch_size=4,
                             num_buckets=2, shuffle=True, seed=1)
    seen = 0
    for batch, y in ld:
        assert batch.num_graphs == 4
        seen += len(y)
    assert seen >= 12


def test_parallel_doc_flow_runs_on_virtual_mesh():
    """docs/parallel.md recipe: balanced order + partition + sharded SpMM."""
    import jax
    import jax.numpy as jnp

    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs 8 virtual devices")

    from tgp_tpu.parallel.spmm import (
        balanced_node_order,
        make_sharded_spmm,
        partition_edges,
    )
    from tgp_tpu.parallel.train import make_mesh

    rng = np.random.default_rng(1)
    n, e, F = 64, 512, 8
    s = rng.integers(0, n, e).astype(np.int32)
    r = rng.integers(0, n, e).astype(np.int32)
    w = rng.normal(size=e).astype(np.float32)
    x = rng.normal(size=(n, F)).astype(np.float32)

    perm, inv = balanced_node_order(r, n, 8, senders=s)
    S, R, W, n_pad, rows_per = partition_edges(
        inv[s].astype(np.int32), inv[r].astype(np.int32), w, perm.size, 8)
    mesh = make_mesh(8, axis="gp")
    fn = make_sharded_spmm(mesh, rows_per, axis="gp")
    x_pad = np.zeros((n_pad, F), np.float32)
    x_pad[:n] = x
    with mesh:
        out = fn(jnp.asarray(x_pad[np.minimum(perm, n_pad - 1)]), S, R, W)
    assert np.isfinite(np.asarray(out)).all()


def test_migration_doc_examples_hold():
    """docs/migration.md: adj_transpose default False; KMIS random scorer
    deterministic without a 'sample' stream."""
    from tgp_tpu.poolers import get_pooler

    p = get_pooler("mincut", in_channels=4, k=3)
    assert p.adj_transpose is False  # documented deviation from reference


def test_performance_doc_regime_map_constants():
    """docs/performance + RESULTS regime map: the boundary constant exists
    and matches the documented 262k."""
    from tgp_tpu.ops.sparse import PALLAS_MIN_EDGES

    assert PALLAS_MIN_EDGES == 1 << 18


def test_math_doc_covers_every_pooler_and_loss():
    """docs/math.md documents every registered pooler alias and every loss
    export (sync guard for the per-operator math reference)."""
    import pathlib
    import tgp_tpu.losses as losses
    from tgp_tpu.poolers import pooler_map

    text = pathlib.Path(__file__).resolve().parents[1].joinpath(
        "docs", "math.md").read_text()
    missing_poolers = [a for a in pooler_map() if f"`{a}`" not in text]
    assert not missing_poolers, missing_poolers
    missing_losses = [n for n in losses.__all__ if n.split("sparse_")[-1]
                      .split("unbatched_")[-1] not in text]
    assert not missing_losses, missing_losses
