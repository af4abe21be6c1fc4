"""Small-branch coverage: activation alias resolution, MLPSelect
act/dropout, segment ops on empty/fully-masked segments, precoarsen API
error paths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.utils_graphs import make_batch
from tgp_tpu.utils.activations import resolve_activation


def test_resolve_activation_aliases():
    x = jnp.asarray([-1.0, 0.0, 2.0])
    assert np.allclose(resolve_activation(None)(x), x)
    assert np.allclose(resolve_activation("tanh")(x), np.tanh(x))
    assert np.allclose(resolve_activation("relu")(x), [0.0, 0.0, 2.0])
    assert np.allclose(resolve_activation("sigmoid")(x),
                       1 / (1 + np.exp(-np.asarray(x))), rtol=1e-6)
    custom = resolve_activation(lambda v: v * 2)
    assert np.allclose(custom(x), 2 * np.asarray(x))
    with pytest.raises(ValueError, match="unknown activation"):
        resolve_activation("bogus")


def test_mlp_select_act_and_dropout():
    from tgp_tpu.graph import to_dense
    from tgp_tpu.select.mlp import MLPSelect

    batch = make_batch([8, 6], num_features=5, seed=61)
    dense = to_dense(batch)
    sel = MLPSelect(in_channels=[5, 8], k=3, act="tanh", dropout=0.5)
    params = sel.init({"params": jax.random.key(0),
                       "dropout": jax.random.key(1)}, dense)
    # deterministic: dropout off, reproducible
    a = sel.apply(params, dense, True)
    b = sel.apply(params, dense, True)
    np.testing.assert_allclose(np.asarray(a.s), np.asarray(b.s), rtol=1e-6)
    # training: dropout on, rng-dependent
    c = sel.apply(params, dense, False,
                  rngs={"dropout": jax.random.key(2)})
    d = sel.apply(params, dense, False,
                  rngs={"dropout": jax.random.key(3)})
    assert not np.allclose(np.asarray(c.s), np.asarray(d.s))


def test_segment_ops_fully_masked():
    from tgp_tpu.ops.segment import (
        segment_max,
        segment_mean,
        segment_min,
        segment_softmax,
        segment_sum,
    )

    x = jnp.ones((6, 3))
    seg = jnp.zeros(6, jnp.int32)
    mask = jnp.zeros(6, bool)
    assert float(segment_sum(x, seg, 2, mask=mask).sum()) == 0.0
    assert float(segment_mean(x, seg, 2, mask=mask).sum()) == 0.0
    mx = segment_max(x, seg, 2, mask=mask)
    mn = segment_min(x, seg, 2, mask=mask)
    # fully-masked segments are ±inf fills (NOT finite — finite fills
    # silently corrupted ASAP once)
    assert np.isneginf(np.asarray(mx)).all()
    assert np.isposinf(np.asarray(mn)).all()
    sm = segment_softmax(jnp.ones(6), seg, 2, mask=mask)
    assert np.isfinite(np.asarray(sm)).all()


def test_segment_topk_rank_ties_stable():
    from tgp_tpu.ops.segment import segment_topk_rank

    score = jnp.asarray([1.0, 1.0, 1.0, 2.0])
    seg = jnp.zeros(4, jnp.int32)
    mask = jnp.ones(4, bool)
    rank = np.asarray(segment_topk_rank(score, seg, 1, mask=mask))
    assert rank[3] == 0  # highest first
    # ties broken by index (stable): 0 < 1 < 2
    assert list(rank[:3]) == [1, 2, 3]


def test_precoarsen_unknown_alias():
    from tgp_tpu.precoarsen import precoarsen_graph

    x, ei = np.ones((4, 2), np.float32), np.array([[0, 1], [1, 0]])
    with pytest.raises((ValueError, KeyError)):
        precoarsen_graph("bogus", ei, 4, levels=1)


def test_pooler_signature_and_unknown():
    from tgp_tpu.poolers import get_pooler, pooler_map, pooler_signature

    pm = pooler_map()
    assert len(pm) == 21
    sig = pooler_signature(pm["topk"])
    assert "ratio" in sig and sig["ratio"] == 0.5
    with pytest.raises(ValueError, match="unknown pooler"):
        get_pooler("nope")
    # _u suffix → unbatched dense mode
    p = get_pooler("mincut_u", in_channels=4, k=3)
    assert p.batched is False
