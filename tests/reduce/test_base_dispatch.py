"""base_reduce layout dispatch + MLPSelect branch matrix (VERDICT r2 #5):
the three reduce paths (sparse / batched-dense / unbatched-dense flat vs
batched return), MLPSelect's dropout and multi-width MLP branches."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tgp_tpu.graph import to_dense
from tgp_tpu.reduce.base import base_reduce
from tgp_tpu.select.base import SelectOutput, cluster_to_select_output
from tgp_tpu.select.mlp import MLPSelect
from tests.utils_graphs import make_batch


@pytest.fixture(scope="module")
def batch():
    return make_batch([7, 5], num_features=4, seed=6)


def test_base_reduce_unbatched_flat_vs_batched(batch):
    """return_batched=False flattens [B,K,F] → [B·K,F] (the reference's
    concat layout) with identical values."""
    N = batch.num_nodes
    rng = np.random.default_rng(0)
    s = jax.nn.softmax(jnp.asarray(rng.normal(size=(N, 3)).astype(
        np.float32)), axis=-1) * batch.node_mask[:, None]
    so = SelectOutput(s=s, node_graph=batch.node_graph,
                      node_mask=batch.node_mask, num_graphs=2,
                      num_clusters=3, max_clusters=3)
    batched = base_reduce(batch.x, so, return_batched=True)
    flat = base_reduce(batch.x, so, return_batched=False)
    assert batched.shape == (2, 3, 4)
    assert flat.shape == (6, 4)
    np.testing.assert_allclose(np.asarray(batched).reshape(6, 4),
                               np.asarray(flat))


def test_base_reduce_sparse_and_dense_agree(batch):
    """A hard assignment expressed sparse vs as a one-hot dense S must
    reduce identically."""
    ci = jnp.where(batch.node_mask, batch.node_graph, 0).astype(jnp.int32)
    so_sparse = cluster_to_select_output(ci, batch, num_clusters=2,
                                         max_clusters=2)
    out_sparse = base_reduce(batch.x, so_sparse)

    N = batch.num_nodes
    s = jnp.zeros((N, 2)).at[jnp.arange(N), ci].set(
        batch.node_mask.astype(jnp.float32))
    so_dense = SelectOutput(s=s, node_graph=batch.node_graph,
                            node_mask=batch.node_mask, num_graphs=2,
                            num_clusters=2, max_clusters=2)
    out_dense = base_reduce(batch.x, so_dense, return_batched=False)
    got = np.asarray(out_sparse)
    want = np.asarray(out_dense)
    # sparse layout is [C, F]; dense unbatched flat is [B·K, F] — here the
    # g-th supernode is cluster g of graph g: compare occupied rows
    np.testing.assert_allclose(got[0], want[0], rtol=1e-5)
    np.testing.assert_allclose(got[1], want[3], rtol=1e-5)


def test_mlp_select_multiwidth_and_dropout(batch):
    """channels list (hidden widths) + dropout>0 branches; eval-mode
    dropout is deterministic."""
    dense = to_dense(batch)
    sel = MLPSelect(in_channels=[4, 8, 8], k=3, dropout=0.5, batched=True)
    params = sel.init({"params": jax.random.key(0),
                       "dropout": jax.random.key(1)}, dense)
    out1 = sel.apply(params, dense, deterministic=True)
    out2 = sel.apply(params, dense, deterministic=True)
    np.testing.assert_allclose(np.asarray(out1.s), np.asarray(out2.s))
    # train mode needs the dropout rng and gives a different S
    out3 = sel.apply(params, dense, deterministic=False,
                     rngs={"dropout": jax.random.key(2)})
    assert not np.allclose(np.asarray(out1.s), np.asarray(out3.s))


def test_mlp_select_unbatched_layout(batch):
    sel = MLPSelect(in_channels=4, k=3, batched=False)
    params = sel.init(jax.random.key(0), batch)
    so = sel.apply(params, batch)
    assert so.s.ndim == 2
    s = np.asarray(so.s)
    nm = np.asarray(batch.node_mask)
    np.testing.assert_allclose(s[nm].sum(-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(s[~nm], 0.0)


def test_mlp_select_wrong_layout_asserts(batch):
    dense = to_dense(batch)
    with pytest.raises(AssertionError):
        sel = MLPSelect(in_channels=4, k=3, batched=True)
        sel.init(jax.random.key(0), batch)  # flat batch into batched mode
    with pytest.raises(AssertionError):
        sel = MLPSelect(in_channels=4, k=3, batched=False)
        sel.init(jax.random.key(0), dense)
