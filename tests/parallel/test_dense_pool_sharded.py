"""Sharded dense-pooler family (VERDICT r3 #4): N-sharded SᵀX / SᵀAS for
mincut/diff must match the pooler's own single-device unbatched forward
(same params) on the virtual 8-device mesh — the sharded twin of the
reference's batched-vs-unbatched equality oracle
(tests/poolers/test_dense_poolers_batched_vs_unbatched.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tgp_tpu.graph import from_graphs
from tgp_tpu.parallel.dense_pool import (
    device_put_sharded_dense,
    make_sharded_dense_pool_step,
    prepare_sharded_dense_graph,
    supported_sharded_poolers,
)
from tgp_tpu.parallel.train import make_mesh
from tgp_tpu.poolers import get_pooler

N_DEV = 8


def _random_graph(n, e, seed=0):
    rng = np.random.default_rng(seed)
    s = rng.integers(0, n, e).astype(np.int64)
    r = rng.integers(0, n, e).astype(np.int64)
    keep = s != r
    s, r = (np.concatenate([s[keep], r[keep]]),
            np.concatenate([r[keep], s[keep]]))
    w = rng.uniform(0.5, 1.5, len(s)).astype(np.float32)
    x = rng.normal(size=(n, 6)).astype(np.float32)
    return x, s, r, w


def _single_device_reference(pooler, n, x, s, r, w, n_pad):
    """Unbatched pooler forward on the zero-padded flat graph."""
    x_pad = np.zeros((n_pad, x.shape[1]), np.float32)
    x_pad[:n] = x
    batch = from_graphs([(x_pad[:n], np.stack([s, r]), w)],
                        pad_nodes=n_pad, pad_edges=len(s))
    params = pooler.init(jax.random.key(3), batch)
    out = pooler.apply(params, batch)
    return params, out


@pytest.mark.parametrize("alias,kw", [
    ("mincut", {}),
    ("diff", {}),
    ("dmon", {}),
    ("hosc", {}),                       # mixed cut: exercises the A³ chain
    ("hosc", {"alpha": 0.0}),           # first-order only
    ("hosc", {"hosc_ortho": True}),
    ("jb", {}),
    ("acc", {}),
])
def test_sharded_matches_unbatched(alias, kw):
    if len(jax.devices()) < N_DEV:
        pytest.skip("needs 8 virtual devices")
    n, e = 48, 160
    x, s, r, w = _random_graph(n, e, seed=11)
    pooler = get_pooler(alias, in_channels=6, k=4, batched=False, **kw)

    (x_pad, mask, S, R, W, n_pad,
     rows_per) = prepare_sharded_dense_graph(x, s, r, w, n, N_DEV)
    params, ref = _single_device_reference(pooler, n, x, s, r, w, n_pad)

    mesh = make_mesh(N_DEV, axis="n")
    step = make_sharded_dense_pool_step(pooler, mesh, rows_per, axis="n")
    with mesh:
        args = device_put_sharded_dense(mesh, x_pad, mask, S, R, W, axis="n")
        x_pool, adj_pool, losses = step(params, *args)

    np.testing.assert_allclose(np.asarray(x_pool),
                               np.asarray(ref.dense.x[0]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(adj_pool),
                               np.asarray(ref.dense.adj[0]),
                               rtol=1e-4, atol=1e-5)
    assert set(losses) == set(ref.loss)
    for name in losses:
        np.testing.assert_allclose(float(losses[name]),
                                   float(ref.loss[name]),
                                   rtol=1e-4, atol=1e-6,
                                   err_msg=name)


def test_sharded_diff_normalized_loss():
    if len(jax.devices()) < N_DEV:
        pytest.skip("needs 8 virtual devices")
    n, e = 40, 120
    x, s, r, w = _random_graph(n, e, seed=5)
    pooler = get_pooler("diff", in_channels=6, k=3, batched=False,
                        normalize_loss=True)
    (x_pad, mask, S, R, W, n_pad,
     rows_per) = prepare_sharded_dense_graph(x, s, r, w, n, N_DEV)
    params, ref = _single_device_reference(pooler, n, x, s, r, w, n_pad)
    mesh = make_mesh(N_DEV, axis="n")
    step = make_sharded_dense_pool_step(pooler, mesh, rows_per, axis="n")
    with mesh:
        args = device_put_sharded_dense(mesh, x_pad, mask, S, R, W, axis="n")
        _, _, losses = step(params, *args)
    np.testing.assert_allclose(float(losses["link_loss"]),
                               float(ref.loss["link_loss"]),
                               rtol=1e-4, atol=1e-8)


def test_sharded_gradients_match_unbatched():
    """End-to-end: d(total loss)/d(selector params) must equal the
    single-device gradient — the real training contract."""
    if len(jax.devices()) < N_DEV:
        pytest.skip("needs 8 virtual devices")
    n, e = 32, 96
    x, s, r, w = _random_graph(n, e, seed=7)
    pooler = get_pooler("mincut", in_channels=6, k=4, batched=False)
    (x_pad, mask, S, R, W, n_pad,
     rows_per) = prepare_sharded_dense_graph(x, s, r, w, n, N_DEV)
    x_pad_np = np.zeros((n_pad, 6), np.float32)
    x_pad_np[:n] = x
    batch = from_graphs([(x, np.stack([s, r]), w)],
                        pad_nodes=n_pad, pad_edges=len(s))
    params = pooler.init(jax.random.key(3), batch)

    def ref_loss(p):
        out = pooler.apply(p, batch)
        return out.loss["cut_loss"] + out.loss["ortho_loss"]

    g_ref = jax.grad(ref_loss)(params)

    mesh = make_mesh(N_DEV, axis="n")
    step = make_sharded_dense_pool_step(pooler, mesh, rows_per, axis="n")

    with mesh:
        args = device_put_sharded_dense(mesh, x_pad, mask, S, R, W, axis="n")

        def sh_loss(p):
            _, _, losses = step(p, *args)
            return losses["cut_loss"] + losses["ortho_loss"]

        g_sh = jax.grad(sh_loss)(params)

    for (ka, va), (kb, vb) in zip(
            jax.tree_util.tree_leaves_with_path(g_ref),
            jax.tree_util.tree_leaves_with_path(g_sh)):
        np.testing.assert_allclose(np.asarray(vb), np.asarray(va),
                                   rtol=2e-4, atol=1e-6, err_msg=str(ka))


def test_supported_list_and_rejection():
    assert set(supported_sharded_poolers()) == {
        "mincut", "diff", "dmon", "hosc", "jb", "acc", "bnpool"}
    pooler = get_pooler("lap")  # dense but outside the MLP-select family
    mesh = make_mesh(1, axis="n")
    with pytest.raises(NotImplementedError):
        make_sharded_dense_pool_step(pooler, mesh, rows_per=8, axis="n")
    batched = get_pooler("mincut", in_channels=6, k=4)
    with pytest.raises(AssertionError):
        make_sharded_dense_pool_step(batched, mesh, rows_per=8, axis="n")


def test_sharded_bnpool_matches_unbatched():
    """BNPool: per-node-keyed Beta draws + host-sampled negatives make the
    sharded forward EXACTLY reproduce the single-device unbatched forward
    (same params, same key, same negatives) — sampling included."""
    if len(jax.devices()) < N_DEV:
        pytest.skip("needs 8 virtual devices")
    from tgp_tpu.parallel.dense_pool import prepare_sharded_negatives

    n, e = 48, 160
    x, s, r, w = _random_graph(n, e, seed=23)
    pooler = get_pooler("bnpool", in_channels=6, k=4, batched=False,
                        per_node_keys=True)
    (x_pad, mask, S, R, W, n_pad,
     rows_per) = prepare_sharded_dense_graph(x, s, r, w, n, N_DEV)
    NS, NR, NM, flat_neg = prepare_sharded_negatives(7, s, r, n, N_DEV)

    batch = from_graphs([(x, np.stack([s, r]), w)],
                        pad_nodes=n_pad, pad_edges=len(s))
    key = jax.random.PRNGKey(11)
    params = pooler.init(
        {"params": jax.random.key(3), "sample": jax.random.key(0)}, batch)
    ref = pooler.apply(params, batch, negatives=flat_neg,
                       rngs={"sample": key})

    mesh = make_mesh(N_DEV, axis="n")
    step = make_sharded_dense_pool_step(pooler, mesh, rows_per, axis="n")
    with mesh:
        args = device_put_sharded_dense(mesh, x_pad, mask, S, R, W, axis="n")
        x_pool, adj_pool, losses = step(key, params, *args, NS, NR, NM)

    np.testing.assert_allclose(np.asarray(x_pool),
                               np.asarray(ref.dense.x[0]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(adj_pool),
                               np.asarray(ref.dense.adj[0]),
                               rtol=1e-4, atol=1e-5)
    assert set(losses) == set(ref.loss)
    for name in losses:
        np.testing.assert_allclose(float(losses[name]),
                                   float(ref.loss[name]),
                                   rtol=1e-4, atol=1e-6, err_msg=name)


def test_dp_select_per_node_keys_layout_invariant():
    """per_node_keys: the batched [B,N] and flat layouts draw identical
    sticks for the same (graph, position) — the property the sharded path
    relies on."""
    from tgp_tpu.graph import to_dense
    from tgp_tpu.select.dp import DPSelect

    rng = np.random.default_rng(3)
    graphs = [(rng.normal(size=(5, 4)).astype(np.float32),
               np.zeros((2, 1), np.int64)),
              (rng.normal(size=(3, 4)).astype(np.float32),
               np.zeros((2, 1), np.int64))]
    flat = from_graphs(graphs)
    dense = to_dense(flat)
    sel_flat = DPSelect(in_channels=4, k=3, batched=False,
                        per_node_keys=True)
    sel_dense = DPSelect(in_channels=4, k=3, batched=True,
                         per_node_keys=True)
    key = jax.random.PRNGKey(5)
    p = sel_flat.init({"params": jax.random.key(0),
                       "sample": jax.random.key(0)}, flat)
    so_f = sel_flat.apply(p, flat, rngs={"sample": key})
    so_d = sel_dense.apply(p, dense, rngs={"sample": key})
    # flat row i of graph g == dense row (g, pos)
    ng = np.asarray(flat.node_graph)
    pos = np.asarray(flat.node_pos)
    nm = np.asarray(flat.node_mask)
    sf = np.asarray(so_f.s)
    sd = np.asarray(so_d.s)
    for i in np.nonzero(nm)[0]:
        np.testing.assert_allclose(sf[i], sd[ng[i], pos[i]],
                                   rtol=1e-6, atol=1e-7)


def test_sharded_dropout_training_mode():
    """deterministic=False plumbs selector dropout: the step takes a
    leading rng, different keys give different assignments, same key is
    reproducible (review: dropout was silently disabled in the sharded
    step with no way to enable it)."""
    if len(jax.devices()) < N_DEV:
        pytest.skip("needs 8 virtual devices")
    n, e = 48, 160
    x, s, r, w = _random_graph(n, e, seed=13)
    # dropout applies between HIDDEN layers, so give the MLP one
    pooler = get_pooler("mincut", in_channels=[6, 8], k=4, batched=False,
                        dropout=0.5)
    (x_pad, mask, S, R, W, n_pad,
     rows_per) = prepare_sharded_dense_graph(x, s, r, w, n, N_DEV)
    params, _ = _single_device_reference(pooler, n, x, s, r, w, n_pad)
    mesh = make_mesh(N_DEV, axis="n")
    step = make_sharded_dense_pool_step(pooler, mesh, rows_per, axis="n",
                                        deterministic=False)
    with mesh:
        args = device_put_sharded_dense(mesh, x_pad, mask, S, R, W,
                                        axis="n")
        xa, _, la = step(jax.random.PRNGKey(0), params, *args)
        xb, _, lb = step(jax.random.PRNGKey(0), params, *args)
        xc, _, lc = step(jax.random.PRNGKey(7), params, *args)
    np.testing.assert_allclose(np.asarray(xa), np.asarray(xb))
    assert not np.allclose(np.asarray(xa), np.asarray(xc))
