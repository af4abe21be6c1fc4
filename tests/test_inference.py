"""Predictor: shape-bucketed batch inference with a bounded jit cache."""

import jax
import numpy as np
import pytest

from tgp_tpu.models.classifiers import PoolingClassifier
from tgp_tpu.models.inference import Predictor, geometric_budget
from tgp_tpu.poolers import get_pooler
from tests.utils_graphs import erdos_renyi_graph


def _graphs(sizes, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for n in sizes:
        x, ei = erdos_renyi_graph(n, 0.3, num_features=4, seed=int(rng.integers(1 << 30)))
        out.append((x, ei))
    return out


@pytest.fixture(scope="module")
def setup():
    graphs = _graphs([6, 9, 14, 7, 30, 11, 5, 8, 21, 6, 9])
    pooler = get_pooler("topk", in_channels=8, ratio=0.5)
    model = PoolingClassifier(pooler=pooler, num_classes=3, hidden=8)
    from tgp_tpu.graph import from_graphs

    params = model.init(jax.random.key(0), from_graphs(graphs[:2]))

    def apply_fn(p, b):
        return model.apply(p, b)[0]

    return graphs, params, apply_fn


def test_geometric_budget():
    assert geometric_budget(1) == 64
    assert geometric_budget(64) == 64
    assert geometric_budget(65) == 128
    assert geometric_budget(700, base=256) == 1024


def test_predictor_matches_direct_apply(setup):
    graphs, params, apply_fn = setup
    from tgp_tpu.graph import from_graphs

    pred = Predictor(apply_fn, params, batch_size=4)
    got = pred(graphs)
    assert got.shape == (len(graphs), 3)
    # oracle: each graph scored alone through the same padded budgets
    for g, row in zip(graphs, got):
        pn = geometric_budget(g[0].shape[0] * 1)
        solo = Predictor(apply_fn, params, batch_size=1)([g])
        np.testing.assert_allclose(row, solo[0], rtol=1e-4, atol=1e-5)


def test_predictor_bounded_compiles(setup):
    graphs, params, apply_fn = setup
    pred = Predictor(apply_fn, params, batch_size=4)
    pred(graphs)
    first = pred.num_compiled
    # a second pass with the same size distribution hits the cache
    pred(list(reversed(graphs)))
    # reversal regroups sizes into different chunks — allow a new bucket or
    # two, but the cache must stay O(buckets), not O(batches)
    assert pred.num_compiled <= first + 2
    total_batches = 2 * ((len(graphs) + 3) // 4)
    assert pred.num_compiled < total_batches


def test_predictor_short_final_batch_sliced(setup):
    graphs, params, apply_fn = setup
    pred = Predictor(apply_fn, params, batch_size=8)
    got = pred(graphs[:3])  # 3 < B: cycle-padded then sliced
    assert got.shape == (3, 3)
    assert np.isfinite(got).all()
