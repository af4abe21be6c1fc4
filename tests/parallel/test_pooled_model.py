"""End-to-end sharded pooled model: GCN → (distributed top-k → repartition →
coarse GCN) × L → readout on the 8-device virtual mesh must match a
single-device NumPy reference."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tgp_tpu.parallel.pooled_model import (
    init_pooled_params,
    make_sharded_pooled_forward,
    prepare_sharded_graph,
)
from tests.utils_graphs import erdos_renyi_graph


def _mesh():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return Mesh(np.array(devs[:8]), ("gp",))


def _padded_reference(params, x_pad, ei, n_nodes, n_pad, ks):
    """Single-device NumPy reference with the same padding semantics."""
    params = jax.tree.map(np.asarray, params)
    s_all = np.concatenate([ei[0], np.arange(n_nodes)])
    r_all = np.concatenate([ei[1], np.arange(n_nodes)])
    w = np.ones(s_all.shape[0], np.float64)
    deg = np.zeros(n_nodes)
    np.add.at(deg, s_all, w)
    dinv = 1.0 / np.sqrt(np.clip(deg, 1e-12, None))
    w = w * dinv[s_all] * dinv[r_all]

    x = np.asarray(x_pad, np.float64)
    h_msg = x @ params["W1"]
    h = np.zeros((n_pad, h_msg.shape[1]))
    np.add.at(h, r_all, h_msg[s_all] * w[:, None])
    h = np.maximum(h + params["b1"], 0.0)

    cur_valid = n_nodes
    s_cur, r_cur, w_cur = s_all, r_all, w
    h_glob = None
    for level, k in enumerate(ks):
        p = params[f"p{level}"]
        score = np.tanh((h @ p) / max(np.linalg.norm(p), 1e-12))
        score[cur_valid:] = -np.inf
        order = np.argsort(-score, kind="stable")
        rank = np.argsort(order, kind="stable")
        kept = order[:k]
        gate = score[kept]
        gate[~np.isfinite(gate)] = 0.0
        xp = h[kept] * gate[:, None]
        new_s, new_r = rank[s_cur], rank[r_cur]
        keep = (new_s < k) & (new_r < k) & (w_cur != 0)
        s_cur = np.where(keep, new_s, 0)
        r_cur = np.where(keep, new_r, 0)
        w_cur = np.where(keep, w_cur, 0.0)
        m = xp @ params[f"W{level + 2}"]
        agg = np.zeros((k, m.shape[1]))
        np.add.at(agg, r_cur, m[s_cur] * w_cur[:, None])
        h_glob = np.maximum(agg + params[f"b{level + 2}"], 0.0)
        h = h_glob
        cur_valid = k
    z = h_glob.sum(0)
    return z @ params["Wh"] + params["bh"], h_glob


@pytest.mark.parametrize("n_nodes,num_levels", [(256, 1), (320, 1), (256, 2)])
def test_sharded_pooled_forward_matches_reference(n_nodes, num_levels):
    mesh = _mesh()
    D = 8
    x_np, ei = erdos_renyi_graph(n_nodes, p=0.05, num_features=12, seed=7)
    S, R, W, n_pad, rows_per = prepare_sharded_graph(
        ei[0], ei[1], None, n_nodes, D)
    x = np.zeros((n_pad, 12), np.float32)
    x[:n_nodes] = x_np

    params = init_pooled_params(jax.random.key(0), 12, 16, 3,
                                num_levels=num_levels)
    fwd, ks = make_sharded_pooled_forward(
        mesh, rows_per=rows_per, n_pad=n_pad, num_valid=n_nodes, ratio=0.5,
        num_levels=num_levels)

    shard = NamedSharding(mesh, P("gp"))
    x_sh = jax.device_put(jnp.asarray(x), shard)
    S_sh = jax.device_put(S, shard)
    R_sh = jax.device_put(R, shard)
    W_sh = jax.device_put(W, shard)

    logits, h_last = fwd(params, x_sh, S_sh, R_sh, W_sh)
    ref_logits, ref_h = _padded_reference(params, x, ei, n_nodes, n_pad, ks)
    np.testing.assert_allclose(np.asarray(logits), ref_logits,
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(h_last), ref_h,
                               rtol=2e-4, atol=2e-5)


def test_scaling_harness_runs():
    """Scaling-efficiency harness: edges/s vs device count on the virtual
    mesh (wall-clock on virtual CPU devices is NOT a hardware number — this
    pins the measurement machinery for when multi-chip hardware exists)."""
    from tgp_tpu.parallel.scaling import measure_pooled_scaling

    res = measure_pooled_scaling(n_nodes=512, n_feats=8, degree=4,
                                 device_counts=(1, 2, 4, 8), iters=3)
    assert set(res) == {1, 2, 4, 8}
    for d, rec in res.items():
        assert rec["edges_per_s"] > 0
        assert np.isfinite(rec["seconds_per_step"])


def test_sharded_pooled_gradients_match_single_device():
    """∂loss/∂params of the sharded (D=8) pooled model must equal the same
    model on a 1-device mesh — the collectives are gradient-transparent."""
    D = 8
    n_nodes = 256
    x_np, ei = erdos_renyi_graph(n_nodes, p=0.05, num_features=12, seed=9)

    def build(device_count):
        devs = jax.devices()[:device_count]
        mesh = Mesh(np.array(devs), ("gp",))
        S, R, W, n_pad, rows_per = prepare_sharded_graph(
            ei[0], ei[1], None, n_nodes, device_count)
        x = np.zeros((n_pad, 12), np.float32)
        x[:n_nodes] = x_np
        fwd, _ = make_sharded_pooled_forward(
            mesh, rows_per=rows_per, n_pad=n_pad, num_valid=n_nodes,
            ratio=0.5, num_levels=1)
        shard = NamedSharding(mesh, P("gp"))
        args = tuple(jax.device_put(v, shard)
                     for v in (jnp.asarray(x), S, R, W))

        def loss(params):
            logits, _ = fwd(params, *args)
            return jnp.sum(logits ** 2)

        return loss

    params = init_pooled_params(jax.random.key(1), 12, 16, 3, num_levels=1)
    if len(jax.devices()) < D:
        pytest.skip("needs 8 virtual devices")
    g8 = jax.grad(build(D))(params)
    g1 = jax.grad(build(1))(params)
    for k in g1:
        np.testing.assert_allclose(np.asarray(g8[k]), np.asarray(g1[k]),
                                   rtol=5e-4, atol=1e-5, err_msg=k)


def test_overbudget_k_gate_grads_finite():
    """ks rounded up to a device multiple can exceed num_valid; the -inf
    scores of padding picks must not NaN the backward (round-4 fix)."""
    from jax import shard_map

    from tgp_tpu.parallel.pooled_model import _forward_local, level_ks

    mesh = _mesh()
    n_dev = 8
    n_nodes = 6  # ratio 0.9 -> k=6 -> rounded to 8 > num_valid
    x, ei = erdos_renyi_graph(n_nodes, p=0.6, seed=0)
    S, R, W, n_pad, rows_per = prepare_sharded_graph(
        ei[0], ei[1], np.ones(ei.shape[1], np.float32), n_nodes, n_dev)
    ks = level_ks(n_nodes, 0.9, 1, n_dev)
    assert ks[0] > n_nodes  # the over-budget case under test
    params = init_pooled_params(
        jax.random.PRNGKey(0), x.shape[1], 16, 3, num_levels=1)
    x_pad = jnp.zeros((n_pad, x.shape[1])).at[:n_nodes].set(x)

    def loss(p, x_loc, S_d, R_d, W_d):
        logits, _ = _forward_local(
            p, x_loc, S_d[0], R_d[0], W_d[0], rows_per=rows_per,
            num_valid=n_nodes, ks=ks, axis="gp")
        return jnp.sum(logits ** 2)

    smapped = shard_map(
        lambda p, xl, s, r, w: jax.grad(loss)(p, xl, s, r, w),
        mesh=mesh,
        in_specs=(P(), P("gp"), P("gp"), P("gp"), P("gp")),
        out_specs=P(),
    )
    grads = smapped(params, x_pad, S, R, W)
    for name, g in grads.items():
        assert np.isfinite(np.asarray(g)).all(), name


def test_level_ks_validation_and_agreement():
    from tgp_tpu.parallel.pooled_model import level_ks
    with pytest.raises(ValueError, match="num_levels"):
        level_ks(64, 0.5, 0, 8)
    assert level_ks(100, 0.5, 2, 8) == (56, 32)


def test_dp_train_step_supports_adamw():
    """tx.update must receive params so weight-decay optimizers work."""
    import optax

    from tgp_tpu.parallel.train import make_dp_train_step, make_mesh

    _mesh()  # skip when <8 devices
    mesh = make_mesh()  # the dp mesh the train step expects
    tx = optax.adamw(1e-3, weight_decay=1e-4)
    params = {"w": jnp.ones((4, 2))}

    def loss_fn(p, batch, y):
        return jnp.mean((batch @ p["w"] - y) ** 2)

    step = make_dp_train_step(loss_fn, tx, mesh)
    opt_state = tx.init(params)
    batch = jnp.ones((8, 3, 4))
    y = jnp.zeros((8, 3, 2))
    params2, opt_state, loss = step(params, opt_state, batch, y)
    assert np.isfinite(float(loss))
    assert not np.allclose(np.asarray(params2["w"]), 1.0)
