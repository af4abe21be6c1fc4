"""Aggregation reducer tests (reference: tests/reduce/)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tgp_tpu.reduce.aggr import AggrReduce, aggr_aliases, get_aggr


@pytest.fixture
def data():
    rng = np.random.default_rng(0)
    n, C = 30, 6
    x = rng.normal(size=(n, 5)).astype(np.float32)
    seg = rng.integers(0, C, n).astype(np.int32)
    mask = rng.random(n) > 0.2
    return jnp.asarray(x), jnp.asarray(seg), jnp.asarray(mask), C


@pytest.mark.parametrize("alias,npfn", [
    ("sum", lambda v: v.sum(0)),
    ("mean", lambda v: v.mean(0)),
    ("max", lambda v: v.max(0)),
    ("min", lambda v: v.min(0)),
    ("var", lambda v: v.var(0)),
    ("std", lambda v: v.std(0)),
    ("median", lambda v: np.sort(v, 0)[(len(v) - 1) // 2]),
])
def test_stateless_aggrs(alias, npfn, data):
    x, seg, mask, C = data
    agg = get_aggr(alias)
    out = np.asarray(agg(x, seg, C, mask))
    xn, sn, mn = np.asarray(x), np.asarray(seg), np.asarray(mask)
    for c in range(C):
        sel = (sn == c) & mn
        if sel.sum():
            np.testing.assert_allclose(out[c], npfn(xn[sel]), rtol=1e-4,
                                       atol=1e-4, err_msg=alias)


@pytest.mark.parametrize("alias", ["attentional", "set2set", "lstm", "gru",
                                   "sort", "deep_sets", "mlp",
                                   "set_transformer"])
def test_learnable_aggrs(alias, data):
    x, seg, mask, C = data
    mod = AggrReduce(aggr=alias)
    params = mod.init(jax.random.key(0), x, None, node_graph=seg,
                      num_graphs=C, node_mask=mask)
    out = mod.apply(params, x, None, node_graph=seg, num_graphs=C,
                    node_mask=mask)
    assert out.shape[0] == C
    assert np.isfinite(np.asarray(out)).all()


def test_aggr_reduce_with_select_output(data):
    from tests.utils_graphs import make_batch
    from tgp_tpu.poolers import get_pooler

    batch = make_batch([8, 6], num_features=5, seed=2)
    pooler = get_pooler("graclus")
    out = pooler(batch)
    mod = AggrReduce(aggr="mean")
    params = mod.init(jax.random.key(0), batch.x, out.so)
    pooled = mod.apply(params, batch.x, out.so)
    assert pooled.shape == (out.so.num_clusters, 5)

    # oracle vs manual mean per cluster
    ci = np.asarray(out.so.cluster_index)
    sel = np.asarray(out.so.node_sel_mask)
    xn = np.asarray(batch.x)
    got = np.asarray(pooled)
    for c in np.unique(ci[sel]):
        members = np.nonzero((ci == c) & sel)[0]
        np.testing.assert_allclose(got[c], xn[members].mean(0), rtol=1e-4,
                                   atol=1e-4)


def test_unknown_alias():
    with pytest.raises(ValueError):
        get_aggr("bogus")
