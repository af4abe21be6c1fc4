"""API-surface tests for the SRC core (`tgp_tpu/src.py`): PoolingOutput
accessors, SRCPooling plumbing helpers, DenseSRCPooling preprocessing, and
the precoarsening protocol (reference behaviors: tgp/src.py:19-692)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tgp_tpu.graph import DenseGraphBatch, GraphBatch, to_dense
from tgp_tpu.poolers import get_pooler
from tgp_tpu.src import DenseSRCPooling, PoolingOutput, PrecoarseningMixin
from tests.utils_graphs import make_batch


@pytest.fixture(scope="module")
def batch():
    return make_batch([6, 9], num_features=4, seed=0, weighted=True,
                      pad_nodes=16, pad_edges=80)


def _run(alias, batch, **kw):
    pooler = get_pooler(alias, in_channels=4, ratio=0.5, **kw)
    params = pooler.init(jax.random.key(0), batch)
    return pooler.apply(params, batch)


def test_pooling_output_accessors(batch):
    out = _run("mincut", batch, k=4)
    assert out.has_loss
    for name in out.loss:
        v = out.get_loss_value(name)
        assert np.isfinite(float(v))
    np.testing.assert_allclose(float(out.loss_sum()),
                               float(sum(out.loss.values())), rtol=1e-6)
    assert out.x.shape[-1] == 4 or out.x.ndim == 3  # pooled features exist
    assert out.mask.dtype == jnp.bool_ or out.mask.dtype == bool


def test_pooling_output_empty_loss(batch):
    out = _run("topk", batch)
    # topk has no aux losses
    assert not out.has_loss
    assert float(out.loss_sum()) == 0.0
    with pytest.raises(KeyError):
        out.get_loss_value("nope")


def test_srcpooling_lift_and_reduce_helpers(batch):
    pooler = get_pooler("topk", in_channels=4, ratio=0.5)
    params = pooler.init(jax.random.key(0), batch)
    out = pooler.apply(params, batch)
    lifted = pooler.lift(out.graph.x, out.so)
    assert lifted.shape == batch.x.shape
    red = pooler.reduce(batch.x, out.so)
    assert red.shape[0] == out.graph.x.shape[0]


def test_srcpooling_connect_helper(batch):
    pooler = get_pooler("topk", in_channels=4, ratio=0.5)
    params = pooler.init(jax.random.key(0), batch)
    out = pooler.apply(params, batch)
    s, r, w, m = pooler.connect(batch, out.so)
    assert s.shape == r.shape == w.shape == m.shape
    # pooled edges index into the pooled node array (graph-major slots)
    n_pool = out.graph.x.shape[0]
    assert int(jnp.max(jnp.where(m, s, 0))) < n_pool
    assert int(jnp.max(jnp.where(m, r, 0))) < n_pool


def test_ensure_dense_passthrough_and_transpose(batch):
    dense = to_dense(batch)
    # pre-densified input is returned unchanged (caller's convention)
    same = DenseSRCPooling.ensure_dense(dense, adj_transpose=True)
    assert same is dense
    # sparse input honors adj_transpose
    d1 = DenseSRCPooling.ensure_dense(batch)
    d2 = DenseSRCPooling.ensure_dense(batch, adj_transpose=True)
    np.testing.assert_allclose(np.asarray(d2.adj),
                               np.asarray(jnp.swapaxes(d1.adj, -1, -2)))


def test_finalize_sparse_output_roundtrip(batch):
    dense = to_dense(batch)
    gb = DenseSRCPooling.finalize_sparse_output(dense)
    assert isinstance(gb, GraphBatch)
    # node features survive the round trip on valid nodes
    back = to_dense(gb)
    np.testing.assert_allclose(np.asarray(back.x), np.asarray(dense.x),
                               atol=1e-6)


class _StubPrecoarsen(PrecoarseningMixin):
    def precoarsen_graph(self, edge_index, num_nodes, edge_weight=None):
        k = max(num_nodes // 2, 1)
        return {"edge_index": edge_index[:, : max(edge_index.shape[1] // 2, 1)],
                "edge_weight": None, "num_clusters": k}


def test_precoarsening_mixin_protocol():
    base = PrecoarseningMixin()
    with pytest.raises(NotImplementedError):
        base.precoarsen_graph(np.zeros((2, 1), np.int64), 2)
    ei = np.stack([np.arange(8), (np.arange(8) + 1) % 8]).astype(np.int64)
    levels = _StubPrecoarsen().multi_level_precoarsen(ei, 8, levels=3)
    assert [lvl["num_clusters"] for lvl in levels] == [4, 2, 1]
    assert levels[1]["edge_index"].shape[1] == 2
