"""Symmetry/invariance properties of the pooling stack:

* node-relabeling invariance — permuting a graph's nodes must not change
  any aux loss (poolers are permutation-equivariant);
* batch-order invariance — permuting the graphs of a batch permutes
  per-graph outputs and leaves mean-reduced losses unchanged.

These catch graph-boundary and mask-layout bugs that fixed-layout tests
cannot (no reference analogue — the static-shape design makes them cheap)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tgp_tpu.graph import from_graphs
from tgp_tpu.poolers import get_pooler

RTOL = ATOL = 1e-3


def _graphs(seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for n in (9, 6, 12):
        upper = np.triu(rng.random((n, n)) < 0.4, k=1)
        adj = upper | upper.T
        s, r = np.nonzero(adj)
        x = rng.normal(size=(n, 6)).astype(np.float32)
        out.append((x, np.stack([s, r]).astype(np.int64)))
    return out


def _permute_nodes(g, seed):
    x, ei = g
    n = x.shape[0]
    perm = np.random.default_rng(seed).permutation(n)
    inv = np.empty(n, np.int64)
    inv[perm] = np.arange(n)
    return (x[perm], inv[ei])


@pytest.mark.parametrize("alias,kw", [
    ("mincut", {"k": 4}),
    ("dmon", {"k": 4}),
    ("maxcut", {"ratio": 0.5}),
    ("topk", {"ratio": 0.5}),
])
def test_node_relabeling_loss_invariance(alias, kw):
    gs = _graphs()
    b1 = from_graphs(gs, pad_nodes=32, pad_edges=160)
    b2 = from_graphs([_permute_nodes(g, 7 + i) for i, g in enumerate(gs)],
                     pad_nodes=32, pad_edges=160)
    # feature-permutation-equivariant params: the pooler sees identical
    # multisets of (feature, neighborhood) pairs
    pooler = get_pooler(alias, in_channels=6, **kw)
    params = pooler.init(jax.random.key(0), b1)
    out1 = pooler.apply(params, b1)
    out2 = pooler.apply(params, b2)
    if out1.loss:
        for name in out1.loss:
            np.testing.assert_allclose(
                float(out1.loss[name]), float(out2.loss[name]),
                rtol=RTOL, atol=ATOL, err_msg=f"{alias}:{name}")
    # pooled readout (sum over supernodes per graph) is permutation
    # invariant for score-free reduces; for score-gated poolers (topk)
    # the kept-set is the same so the sum matches too
    g1 = out1.graph if out1.graph is not None else None
    if g1 is not None:
        g2 = out2.graph
        for g in range(b1.num_graphs):
            m1 = np.asarray(g1.node_mask) & (np.asarray(g1.node_graph) == g)
            m2 = np.asarray(g2.node_mask) & (np.asarray(g2.node_graph) == g)
            s1 = np.asarray(g1.x)[m1].sum(0)
            s2 = np.asarray(g2.x)[m2].sum(0)
            np.testing.assert_allclose(s1, s2, rtol=5e-3, atol=5e-3,
                                       err_msg=f"{alias} graph {g}")


@pytest.mark.parametrize("alias,kw", [
    ("mincut", {"k": 4}),
    ("jb", {"k": 4}),
    ("topk", {"ratio": 0.5}),
    ("graclus", {}),
])
def test_batch_order_invariance(alias, kw):
    gs = _graphs(seed=3)
    order = [2, 0, 1]
    b1 = from_graphs(gs, pad_nodes=32, pad_edges=160)
    b2 = from_graphs([gs[i] for i in order], pad_nodes=32, pad_edges=160)
    pooler = get_pooler(alias, in_channels=6, **kw)
    params = pooler.init(jax.random.key(0), b1)
    out1 = pooler.apply(params, b1)
    out2 = pooler.apply(params, b2)
    if out1.loss:
        for name in out1.loss:
            np.testing.assert_allclose(
                float(out1.loss[name]), float(out2.loss[name]),
                rtol=RTOL, atol=ATOL, err_msg=f"{alias}:{name}")
    # per-graph pooled feature sums follow the permutation
    g1 = out1.graph if out1.graph is not None else out1.dense
    g2 = out2.graph if out2.graph is not None else out2.dense
    if out1.graph is not None:
        ng1, nm1 = np.asarray(g1.node_graph), np.asarray(g1.node_mask)
        ng2, nm2 = np.asarray(g2.node_graph), np.asarray(g2.node_mask)
        for new_pos, old_pos in enumerate(order):
            s_old = np.asarray(g1.x)[nm1 & (ng1 == old_pos)].sum(0)
            s_new = np.asarray(g2.x)[nm2 & (ng2 == new_pos)].sum(0)
            np.testing.assert_allclose(s_new, s_old, rtol=5e-3, atol=5e-3,
                                       err_msg=f"{alias} graph {old_pos}")
    else:
        for new_pos, old_pos in enumerate(order):
            s_old = np.asarray(g1.x)[old_pos].sum(0)
            s_new = np.asarray(g2.x)[new_pos].sum(0)
            np.testing.assert_allclose(s_new, s_old, rtol=5e-3, atol=5e-3,
                                       err_msg=f"{alias} graph {old_pos}")


@pytest.mark.parametrize("alias,kw", [
    ("mincut", {"k": 4}),
    ("topk", {"ratio": 0.5}),
    ("kmis", {}),
    ("maxcut", {"ratio": 0.5}),
])
def test_padding_budget_invariance(alias, kw):
    """Growing the static padding budgets must not change losses or valid
    outputs — the core static-shape masking contract."""
    gs = _graphs(seed=11)
    b1 = from_graphs(gs, pad_nodes=32, pad_edges=160)
    b2 = from_graphs(gs, pad_nodes=64, pad_edges=512)
    pooler = get_pooler(alias, in_channels=6, **kw)
    params = pooler.init(jax.random.key(0), b1)
    out1 = pooler.apply(params, b1)
    out2 = pooler.apply(params, b2)
    if out1.loss:
        for name in out1.loss:
            np.testing.assert_allclose(
                float(out1.loss[name]), float(out2.loss[name]),
                rtol=RTOL, atol=ATOL, err_msg=f"{alias}:{name}")
    g1 = out1.graph if out1.graph is not None else out1.dense
    g2 = out2.graph if out2.graph is not None else out2.dense
    if out1.graph is not None:
        ng1, nm1 = np.asarray(g1.node_graph), np.asarray(g1.node_mask)
        ng2, nm2 = np.asarray(g2.node_graph), np.asarray(g2.node_mask)
        for g in range(b1.num_graphs):
            s1 = np.asarray(g1.x)[nm1 & (ng1 == g)].sum(0)
            s2 = np.asarray(g2.x)[nm2 & (ng2 == g)].sum(0)
            np.testing.assert_allclose(s1, s2, rtol=5e-3, atol=5e-3,
                                       err_msg=f"{alias} graph {g}")


@pytest.mark.parametrize("alias,kw", [
    ("mincut", {"k": 4}),
    ("topk", {"ratio": 0.5}),
    ("graclus", {}),
])
def test_edge_order_invariance(alias, kw):
    """Shuffling the edge list must not change results beyond float
    reassociation (segment ops are order-invariant; nothing may depend on
    the input edge ordering)."""
    gs = _graphs(seed=21)
    shuffled = []
    for i, (x, ei) in enumerate(gs):
        perm = np.random.default_rng(50 + i).permutation(ei.shape[1])
        shuffled.append((x, ei[:, perm]))
    b1 = from_graphs(gs, pad_nodes=32, pad_edges=160)
    b2 = from_graphs(shuffled, pad_nodes=32, pad_edges=160)
    pooler = get_pooler(alias, in_channels=6, **kw)
    params = pooler.init(jax.random.key(0), b1)
    out1 = pooler.apply(params, b1)
    out2 = pooler.apply(params, b2)
    if out1.loss:
        for name in out1.loss:
            np.testing.assert_allclose(
                float(out1.loss[name]), float(out2.loss[name]),
                rtol=RTOL, atol=ATOL, err_msg=f"{alias}:{name}")
    g1 = out1.graph if out1.graph is not None else out1.dense
    g2 = out2.graph if out2.graph is not None else out2.dense
    if out1.graph is not None:
        ng1, nm1 = np.asarray(g1.node_graph), np.asarray(g1.node_mask)
        ng2, nm2 = np.asarray(g2.node_graph), np.asarray(g2.node_mask)
        for g in range(b1.num_graphs):
            s1 = np.asarray(g1.x)[nm1 & (ng1 == g)].sum(0)
            s2 = np.asarray(g2.x)[nm2 & (ng2 == g)].sum(0)
            np.testing.assert_allclose(s1, s2, rtol=5e-3, atol=5e-3,
                                       err_msg=f"{alias} graph {g}")
