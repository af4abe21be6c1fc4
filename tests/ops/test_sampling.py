"""Negative edge sampling tests (BNPool's sparse reconstruction)."""

import jax
import numpy as np

from tgp_tpu.ops.sampling import negative_edge_sampling
from tests.utils_graphs import make_batch


def test_negative_samples_respect_graphs_and_edges():
    b = make_batch([10, 7, 12], num_features=4, seed=4, pad_nodes=40,
                   pad_edges=256)
    src, dst, mask = negative_edge_sampling(jax.random.key(0), b)
    src, dst, mask = map(np.asarray, (src, dst, mask))
    ng = np.asarray(b.node_graph)
    nm = np.asarray(b.node_mask)
    real = set()
    s, r = np.asarray(b.senders), np.asarray(b.receivers)
    em = np.asarray(b.edge_mask)
    for e in np.nonzero(em)[0]:
        real.add((s[e], r[e]))
    n_checked = 0
    for e in np.nonzero(mask)[0]:
        # endpoints valid nodes of the SAME graph as the positive edge slot
        assert nm[src[e]] and nm[dst[e]]
        assert ng[src[e]] == ng[dst[e]]
        assert src[e] != dst[e]
        # CAP=64 window: nodes with out-degree ≤ 64 are exactly checked
        if (s == src[e]).sum() <= 64:
            assert (src[e], dst[e]) not in real
            n_checked += 1
    assert n_checked > 0
    # a healthy fraction of slots survives
    assert mask.sum() > 0.5 * em.sum()


def test_sampling_is_deterministic_per_key():
    b = make_batch([10, 7], num_features=4, seed=4)
    s1, d1, m1 = negative_edge_sampling(jax.random.key(7), b)
    s2, d2, m2 = negative_edge_sampling(jax.random.key(7), b)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    s3, d3, m3 = negative_edge_sampling(jax.random.key(8), b)
    assert not np.array_equal(np.asarray(s1), np.asarray(s3))


def test_cap_samples_per_graph():
    import jax.numpy as jnp

    from tgp_tpu.ops.sampling import cap_samples_per_graph

    mask = jnp.asarray([True, True, False, True, True, True, True])
    seg = jnp.asarray([0, 0, 0, 0, 1, 1, 1])
    capped = np.asarray(cap_samples_per_graph(mask, seg, 2, cap=2))
    # graph 0 valid slots: 0,1,3 -> keep 0,1; graph 1: 4,5,6 -> keep 4,5
    np.testing.assert_array_equal(
        capped, [True, True, False, False, True, True, False])


def test_bnpool_num_neg_samples_cap():
    import jax

    from tgp_tpu.poolers import get_pooler
    from tests.utils_graphs import make_batch

    b = make_batch([8, 6], num_features=5, seed=1, pad_nodes=16,
                   pad_edges=96)
    rngs = {"params": jax.random.key(0), "sample": jax.random.key(1)}
    uncapped = get_pooler("bnpool_u", in_channels=5, k=3)
    capped = get_pooler("bnpool_u", in_channels=5, k=3, num_neg_samples=2)
    params = uncapped.init(rngs, b)
    l_un = uncapped.apply(params, b, rngs={"sample": jax.random.key(7)}).loss
    l_cap = capped.apply(params, b, rngs={"sample": jax.random.key(7)}).loss
    # fewer negatives -> a different (valid, finite) reconstruction loss
    assert np.isfinite(float(l_cap["quality"]))
    assert float(l_cap["quality"]) != float(l_un["quality"])
