"""Round-5 ADVICE fixes (see ADVICE.md r4):

1. split_graph_tuple: the N == E integer-array ambiguity raises instead of
   silently reinterpreting edge weights as labels.
2. hosc_orthogonality_loss: an all-masked (empty padded) graph contributes
   0 to the batch mean, not the maximal constant.
3. ASAP attention dropout is reachable through PoolingClassifier via its
   ``deterministic`` flag.
4. Predictor returns a stable rank for empty inputs from the first call
   when built with ``out_width``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.utils_graphs import make_batch


def test_split_graph_tuple_ambiguous_raises():
    from tgp_tpu.data.transforms import split_graph_tuple

    x = np.zeros((4, 3), np.float32)
    ei = np.array([[0, 1, 2, 3], [1, 2, 3, 0]])  # E == N == 4
    mult = np.array([2, 1, 3, 1])  # could be labels OR multiplicities
    with pytest.raises(ValueError, match="ambiguous"):
        split_graph_tuple((x, ei, mult))

    # explicit forms stay unambiguous
    x2, ei2, ew2, y2 = split_graph_tuple((x, ei, None, mult))
    assert ew2 is None and np.array_equal(y2, mult)
    x3, ei3, ew3, y3 = split_graph_tuple((x, ei, mult.astype(np.float32)))
    assert y3 is None and np.array_equal(ew3, mult.astype(np.float32))

    # N != E integer arrays still resolve to labels
    ei_small = np.array([[0, 1], [1, 2]])
    _, _, ew4, y4 = split_graph_tuple((x, ei_small, np.array([0, 1, 0, 1])))
    assert ew4 is None and y4 is not None


def test_hosc_ortho_empty_graph_contributes_zero():
    from tgp_tpu.losses import (
        hosc_orthogonality_loss,
        unbatched_hosc_orthogonality_loss,
    )

    # batch of 2: one real graph, one all-masked slot
    S = jnp.asarray(np.random.default_rng(0).dirichlet(
        np.ones(4), size=(2, 6)).astype(np.float32))
    mask = jnp.asarray([[True] * 6, [False] * 6])
    S = S * mask[..., None]
    both = hosc_orthogonality_loss(S, mask=mask, batch_reduction="sum")
    only_real = hosc_orthogonality_loss(S[:1], mask=mask[:1],
                                        batch_reduction="sum")
    np.testing.assert_allclose(float(both), float(only_real), rtol=1e-6)

    # twin parity: flat layout with the empty graph as id 1
    ng = jnp.asarray([0] * 6 + [1] * 6, jnp.int32)
    nm = jnp.asarray([True] * 6 + [False] * 6)
    S_flat = jnp.concatenate([S[0], S[1]])
    got = unbatched_hosc_orthogonality_loss(S_flat, ng, 2, nm,
                                            batch_reduction="sum")
    np.testing.assert_allclose(float(got), float(only_real), rtol=1e-6)


def test_asap_dropout_threads_through_classifier():
    from tgp_tpu.models.classifiers import PoolingClassifier
    from tgp_tpu.poolers import get_pooler

    b = make_batch([8, 6], num_features=5, seed=3, pad_nodes=16,
                   pad_edges=128)
    pooler = get_pooler("asap", in_channels=12, ratio=0.5, dropout=0.5)
    model = PoolingClassifier(pooler=pooler, num_classes=3, hidden=12)
    params = model.init(jax.random.key(0), b)

    # deterministic (default): reproducible, no rng needed
    la, _ = model.apply(params, b)
    lb, _ = model.apply(params, b)
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb))

    # training mode: dropout actually fires (different keys -> different
    # logits), same key reproducible
    l1, _ = model.apply(params, b, deterministic=False,
                        rngs={"dropout": jax.random.key(1)})
    l2, _ = model.apply(params, b, deterministic=False,
                        rngs={"dropout": jax.random.key(1)})
    l3, _ = model.apply(params, b, deterministic=False,
                        rngs={"dropout": jax.random.key(2)})
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2))
    assert not np.allclose(np.asarray(l1), np.asarray(l3))
    # and differs from the deterministic forward
    assert not np.allclose(np.asarray(l1), np.asarray(la))


def test_predictor_empty_input_stable_rank():
    from tgp_tpu.models.classifiers import PoolingClassifier
    from tgp_tpu.models.inference import Predictor
    from tgp_tpu.poolers import get_pooler

    rng = np.random.default_rng(0)

    def graph(n):
        ei = np.stack([rng.integers(0, n, 3 * n), rng.integers(0, n, 3 * n)])
        return rng.normal(size=(n, 4)).astype(np.float32), ei

    pooler = get_pooler("topk", in_channels=8, ratio=0.5)
    model = PoolingClassifier(pooler=pooler, num_classes=3, hidden=8)
    g0 = [graph(6), graph(5)]
    from tgp_tpu.graph import from_graphs

    params = model.init(jax.random.key(0), from_graphs(g0))
    pred = Predictor(lambda p, b: model.apply(p, b)[0], params,
                     batch_size=2, out_width=3)

    first_empty = pred([])
    assert first_empty.shape == (0, 3)  # rank-2 BEFORE any non-empty call
    full = pred(g0)
    assert full.shape == (2, 3)
    # concatenation over chunks with a leading empty chunk works
    np.concatenate([first_empty, full], axis=0)
