"""Trainability-flag parity (reference: tests/test_trainable.py — the
reference's ``is_trainable`` is dynamic, "any parameter requires grad"
(tgp/src.py:255-259); ours is the static class flag ``IS_TRAINABLE``
reflecting the DEFAULT configuration.  The one config-dependent case is
kmis: trainable with the default ``scorer='linear'``, parameter-free with
heuristic scorers — asserted dynamically below."""

import jax
import numpy as np
import pytest

from tests.utils_graphs import make_batch
from tgp_tpu.poolers import get_pooler, pooler_map

# reference list (tests/test_trainable.py:23) minus kmis, whose default
# scorer is trainable here and in the reference ('linear')
NON_TRAINABLE = {"ndp", "nmf", "graclus", "lap", "nopool", "eigen", "sep"}


def test_static_flags_match_reference():
    for alias, cls in pooler_map().items():
        expect = alias not in NON_TRAINABLE
        assert cls.IS_TRAINABLE == expect, (alias, cls.IS_TRAINABLE)


def _param_count(params):
    return sum(np.asarray(p).size
               for p in jax.tree_util.tree_leaves(params))


@pytest.mark.parametrize("alias", ["topk", "sag", "mincut", "maxcut"])
def test_trainable_poolers_have_params(alias):
    batch = make_batch([10, 8], p=0.4, seed=0, num_features=8)
    pooler = get_pooler(alias, in_channels=8, ratio=0.5, k=4)
    rngs = {"params": jax.random.key(0)}
    params = pooler.init(rngs, batch)
    assert _param_count(params) > 0


def test_kmis_trainability_tracks_scorer():
    """Dynamic parity with the reference property: heuristic scorers have
    zero parameters, the default linear scorer has some."""
    batch = make_batch([10, 8], p=0.4, seed=0, num_features=8)
    p_lin = get_pooler("kmis", in_channels=8, k=2, scorer="linear")
    p_deg = get_pooler("kmis", in_channels=8, k=2, scorer="degree")
    n_lin = _param_count(p_lin.init({"params": jax.random.key(0)}, batch))
    n_deg = _param_count(p_deg.init({"params": jax.random.key(0)}, batch))
    assert n_lin > 0
    assert n_deg == 0


@pytest.mark.parametrize("alias", sorted(NON_TRAINABLE - {"nopool"}))
def test_non_trainable_poolers_have_no_mlp_params(alias):
    """Non-trainable poolers must not create trainable parameters at init
    (precoarsen-family poolers are exercised via their select phase)."""
    cls = pooler_map()[alias]
    if not hasattr(cls, "init"):  # host/precoarsen family: no flax params
        pytest.skip("host-side pooler (no flax module)")
    batch = make_batch([10, 8], p=0.4, seed=0, num_features=8)
    try:
        pooler = get_pooler(alias, in_channels=8, ratio=0.5, k=4)
        params = pooler.init({"params": jax.random.key(0)}, batch)
    except (TypeError, NotImplementedError):
        pytest.skip("pooler needs precoarsened input")
    assert _param_count(params) == 0
