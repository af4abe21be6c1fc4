"""global_reduce op × layout matrix: sum/mean/max/min in dense [B,N,F] and
sparse [N,F] modes, empty-graph neutrality, unknown-op error."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from tgp_tpu.reduce.global_reduce import global_reduce


@pytest.fixture
def dense_data():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(3, 5, 4)).astype(np.float32)
    mask = np.array([[1, 1, 1, 0, 0],
                     [1, 1, 1, 1, 1],
                     [0, 0, 0, 0, 0]], bool)  # graph 2 is EMPTY
    return jnp.asarray(x), jnp.asarray(mask), x, mask


@pytest.mark.parametrize("op,npfn", [
    ("sum", lambda v: v.sum(0)),
    ("mean", lambda v: v.mean(0)),
    ("max", lambda v: v.max(0)),
    ("min", lambda v: v.min(0)),
])
def test_dense_ops_match_numpy(dense_data, op, npfn):
    xj, mj, x, mask = dense_data
    out = np.asarray(global_reduce(xj, mask=mj, op=op))
    for b in range(2):
        np.testing.assert_allclose(out[b], npfn(x[b][mask[b]]), rtol=1e-5)
    # empty graph: neutral zeros, never ±inf / nan
    np.testing.assert_allclose(out[2], 0.0)


@pytest.mark.parametrize("op", ["sum", "mean", "max", "min"])
def test_sparse_matches_dense(dense_data, op):
    xj, mj, x, mask = dense_data
    B, N, F = x.shape
    node_graph = jnp.repeat(jnp.arange(B, dtype=jnp.int32), N)
    flat = jnp.asarray(x.reshape(-1, F))
    nm = jnp.asarray(mask.reshape(-1))
    dense_out = np.asarray(global_reduce(xj, mask=mj, op=op))
    sparse_out = np.asarray(global_reduce(
        flat, node_graph=node_graph, num_graphs=B, node_mask=nm, op=op))
    np.testing.assert_allclose(sparse_out, dense_out, rtol=1e-5, atol=1e-6)


def test_unknown_op_raises(dense_data):
    xj, mj, *_ = dense_data
    with pytest.raises(ValueError, match="unknown op"):
        global_reduce(xj, mask=mj, op="median")


def test_sparse_accepts_mask_spelling(dense_data):
    """sparse mode accepts mask= as an alias for node_mask=."""
    xj, mj, x, mask = dense_data
    B, N, F = x.shape
    node_graph = jnp.repeat(jnp.arange(B, dtype=jnp.int32), N)
    flat = jnp.asarray(x.reshape(-1, F))
    nm = jnp.asarray(mask.reshape(-1))
    a = np.asarray(global_reduce(flat, node_graph=node_graph, num_graphs=B,
                                 node_mask=nm, op="sum"))
    b = np.asarray(global_reduce(flat, node_graph=node_graph, num_graphs=B,
                                 mask=nm, op="sum"))
    np.testing.assert_allclose(a, b)
