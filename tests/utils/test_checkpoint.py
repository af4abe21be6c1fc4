"""Checkpoint + precoarsen cache tests."""

import jax
import jax.numpy as jnp
import numpy as np

from tgp_tpu.precoarsen import PreCoarsening
from tgp_tpu.utils.checkpoint import (
    PrecoarsenCache,
    restore_params,
    save_params,
)
from tests.utils_graphs import erdos_renyi_graph


def test_params_roundtrip(tmp_path):
    params = {"dense": {"kernel": jnp.arange(6.0).reshape(2, 3),
                        "bias": jnp.zeros(3)}}
    save_params(tmp_path / "ckpt", params)
    restored = restore_params(tmp_path / "ckpt", like=params)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_precoarsen_cache_roundtrip(tmp_path):
    cache = PrecoarsenCache(root=tmp_path / "cache")
    tf = PreCoarsening(poolers="graclus", levels=2)
    graphs = [erdos_renyi_graph(12, p=0.4, num_features=3, seed=i)
              for i in range(3)]
    out1 = cache.precoarsen_with_cache(tf, graphs)
    # second run hits the cache (compare level payloads)
    out2 = cache.precoarsen_with_cache(tf, graphs)
    for a, b in zip(out1, out2):
        la, lb = a[-1], b[-1]
        assert len(la) == len(lb) == 2
        for x, y in zip(la, lb):
            np.testing.assert_array_equal(x["cluster_index"],
                                          y["cluster_index"])
            np.testing.assert_array_equal(x["edge_index"], y["edge_index"])
