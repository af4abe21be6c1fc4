"""Determinism tests (SURVEY §5: the reference preserves determinism via
sorted summation and sign-fixed eigenvectors; here: same inputs → identical
outputs across runs for every jit path)."""

import jax
import numpy as np
import pytest

from tgp_tpu.poolers import get_pooler
from tests.utils_graphs import make_batch


@pytest.mark.parametrize("alias", ["topk", "kmis", "ec", "graclus", "maxcut",
                                   "mincut", "lap"])
def test_pooler_deterministic(alias):
    b = make_batch([9, 6, 12], num_features=5, seed=2, weighted=True)
    pooler = get_pooler(alias, in_channels=5, ratio=0.5, k=4)
    params = pooler.init(jax.random.key(0), b)
    o1 = pooler.apply(params, b)
    o2 = pooler.apply(params, b)
    x1 = o1.graph.x if o1.graph is not None else o1.dense.x
    x2 = o2.graph.x if o2.graph is not None else o2.dense.x
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))
    if o1.so.is_sparse:
        np.testing.assert_array_equal(np.asarray(o1.so.cluster_index),
                                      np.asarray(o2.so.cluster_index))


def test_precoarsen_deterministic():
    from tgp_tpu.precoarsen import precoarsen_graph
    from tests.utils_graphs import erdos_renyi_graph

    x, ei = erdos_renyi_graph(16, p=0.3, num_features=3, seed=5)
    l1 = precoarsen_graph("ndp", ei, 16, levels=2, seed=3)
    l2 = precoarsen_graph("ndp", ei, 16, levels=2, seed=3)
    for a, b in zip(l1, l2):
        np.testing.assert_array_equal(a["cluster_index"], b["cluster_index"])
        np.testing.assert_array_equal(a["edge_index"], b["edge_index"])
