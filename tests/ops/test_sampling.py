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
