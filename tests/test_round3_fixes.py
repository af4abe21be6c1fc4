"""Round-3 regression tests: ADVICE findings + VERDICT semantics nits.

- BucketedGraphLoader merged-bucket budget safety (edge counts are not
  ordered by the node-size sort).
- Predictor empty input / growth guard / bucket-count telemetry without
  private jit APIs.
- KMIS ``random`` scorer draws from the 'sample' PRNG stream when provided.
- dense-vote budget auto-dispatch boundary: which impl is picked exactly at
  the threshold, and that both impls agree there.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402


def _graph(n, e, seed=0, f=4):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, f)).astype(np.float32)
    ei = rng.integers(0, n, size=(2, e)).astype(np.int64)
    return x, ei


# ---- BucketedGraphLoader merge safety -------------------------------------

def test_bucket_merge_rebudgets_union():
    """Two quantile parts with EQUAL per-part budgets whose union violates
    them: all graphs have 8 nodes (stable sort keeps order), edge counts
    [100, 300, 300, 100] → each part budgets pad_edges=512 (worst pair 400),
    but a shuffled batch can hold both 300-edge graphs (600 > 512).  The
    merged bucket must carry the recomputed union budget."""
    from tgp_tpu.data.loaders import BucketedGraphLoader, compute_budgets

    graphs = [_graph(8, e, seed=i) for i, e in enumerate([100, 300, 300, 100])]
    loader = BucketedGraphLoader(graphs, batch_size=2, num_buckets=2)
    # the two parts share a budget, so they merged into one bucket...
    assert len(loader.buckets) == 1
    # ...and the merged budget covers the worst batch over the UNION
    assert loader.budgets[0] == compute_budgets(graphs, batch_size=2)
    assert loader.budgets[0][1] >= 640  # 600 rounded up to edge_multiple


def test_bucket_merge_every_shuffle_fits():
    """No shuffle order can overflow the merged budget (the pre-fix failure
    was a data-dependent ValueError('padding budget too small'))."""
    from tgp_tpu.data.loaders import BucketedGraphLoader

    graphs = [_graph(8, e, seed=i) for i, e in enumerate([100, 300, 300, 100])]
    for seed in range(10):
        loader = BucketedGraphLoader(graphs, batch_size=2, num_buckets=2,
                                     shuffle=True, seed=seed)
        for batch in loader:  # must not raise
            assert int(np.asarray(batch.edge_mask).sum()) <= batch.num_edges


# ---- Predictor hardening ----------------------------------------------------

def test_geometric_budget_growth_guard():
    from tgp_tpu.models.inference import geometric_budget

    with pytest.raises(ValueError, match="growth"):
        geometric_budget(100, base=64, growth=1.0)
    with pytest.raises(ValueError, match="growth"):
        geometric_budget(100, base=64, growth=0.5)


def test_predictor_empty_input():
    from tgp_tpu.models.inference import Predictor

    pred = Predictor(lambda p, b: jnp.zeros((4, 3)), params={}, batch_size=4)
    out = pred([])
    assert out.shape[0] == 0
    assert pred.num_compiled == 0


def test_predictor_num_compiled_counts_buckets():
    """num_compiled is an own counter over distinct budget tuples — no
    private jit API involved."""
    from tgp_tpu.graph import GraphBatch
    from tgp_tpu.models.inference import Predictor

    def apply_fn(params, batch):
        assert isinstance(batch, GraphBatch)
        return jnp.zeros((4, 3))

    pred = Predictor(apply_fn, params={}, batch_size=4)
    graphs = [_graph(10, 20, seed=i) for i in range(8)]
    pred(graphs)
    first = pred.num_compiled
    assert first >= 1
    pred(graphs)  # same shapes → same buckets → no new compiles
    assert pred.num_compiled == first


# ---- KMIS random scorer PRNG -----------------------------------------------

def test_kmis_random_scorer_uses_sample_stream(small_batch):
    from tgp_tpu.select.kmis import KMISSelect

    sel = KMISSelect(scorer="random", score_heuristic=None)
    params = sel.init({"params": jax.random.key(0),
                       "sample": jax.random.key(0)}, small_batch)
    so1 = sel.apply(params, small_batch, rngs={"sample": jax.random.key(1)})
    so2 = sel.apply(params, small_batch, rngs={"sample": jax.random.key(2)})
    so1b = sel.apply(params, small_batch, rngs={"sample": jax.random.key(1)})
    w1, w2, w1b = (np.asarray(s.weight) for s in (so1, so2, so1b))
    assert not np.allclose(w1, w2)          # fresh draw per key
    np.testing.assert_allclose(w1, w1b)     # same key → same draw
    # un-keyed apply still works (deterministic fallback, documented)
    so3 = sel.apply(params, small_batch)
    so4 = sel.apply(params, small_batch)
    np.testing.assert_allclose(np.asarray(so3.weight), np.asarray(so4.weight))


# ---- dense-vote budget boundary ----------------------------------------------

def test_dense_budget_boundary_dispatch(small_batch, monkeypatch):
    """auto picks dense at B·Nmax² == budget and sparse one element past it,
    and the two impls agree on the matching at the boundary scale."""
    import tgp_tpu.select.edge_contraction as ec

    B, Nm = small_batch.num_graphs, small_batch.max_nodes
    size = B * Nm * Nm
    rank = jnp.argsort(
        jnp.where(small_batch.edge_mask, -small_batch.edge_weight, 1e9)
    ).astype(jnp.int32)
    rank = jnp.zeros(small_batch.num_edges, jnp.int32).at[rank].set(
        jnp.arange(small_batch.num_edges, dtype=jnp.int32))

    calls = []
    real_dense, real_sparse = ec.maximal_matching_dense, ec.maximal_matching

    def spy_dense(*a, **k):
        calls.append("dense")
        return real_dense(*a, **k)

    def spy_sparse(*a, **k):
        calls.append("sparse")
        return real_sparse(*a, **k)

    monkeypatch.setattr(ec, "maximal_matching_dense", spy_dense)
    monkeypatch.setattr(ec, "maximal_matching", spy_sparse)

    import tgp_tpu.ops.sparse as sp_ops

    # the dispatch reads ops.sparse.DENSE_VOTE_BUDGET through
    # use_dense_vote, so that is the knob to patch
    monkeypatch.setattr(sp_ops, "DENSE_VOTE_BUDGET", size)  # exactly at the budget
    m_at = ec.matching(rank, small_batch, impl="auto")
    assert calls[-1] == "dense"

    monkeypatch.setattr(sp_ops, "DENSE_VOTE_BUDGET", size - 1)  # one past it
    m_past = ec.matching(rank, small_batch, impl="auto")
    assert calls[-1] == "sparse"

    np.testing.assert_array_equal(np.asarray(m_at), np.asarray(m_past))
