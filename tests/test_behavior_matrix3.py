"""Behavioral matrix part 3: loss-coefficient branches (hosc/jb/diff),
nopool identity, eigenpool modes, GraphLoader semantics, checkpoint steps
(reference coverage model: tests/poolers/test_hosc.py, test_nopool.py,
tests/data/test_loaders.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.utils_graphs import erdos_renyi_graph, make_batch
from tgp_tpu.poolers import get_pooler


@pytest.fixture(scope="module")
def batch():
    return make_batch([10, 8], num_features=6, seed=21, weighted=True)


# ---------------------------------------------------------- loss branches
def test_hosc_alpha_blends_cut_terms(batch):
    """HOSC loss = (1−α)·mincut + α·ho_mincut: endpoints differ, midpoint
    is the average (linearity in α)."""
    outs = {}
    p0 = get_pooler("hosc", in_channels=6, k=4, alpha=0.0)
    params = p0.init(jax.random.key(0), batch)
    for a in (0.0, 0.5, 1.0):
        p = get_pooler("hosc", in_channels=6, k=4, alpha=a)
        outs[a] = {k: float(v) for k, v in
                   p.apply(params, batch).loss.items()}
    cut_key = next(k for k in outs[0.0] if "cut" in k or "hosc" in k)
    lo, mid, hi = (outs[a][cut_key] for a in (0.0, 0.5, 1.0))
    assert lo != hi
    np.testing.assert_allclose(mid, 0.5 * (lo + hi), rtol=1e-4)


def test_hosc_ortho_flag_changes_loss(batch):
    p1 = get_pooler("hosc", in_channels=6, k=4, hosc_ortho=False)
    params = p1.init(jax.random.key(0), batch)
    l1 = p1.apply(params, batch).loss
    p2 = get_pooler("hosc", in_channels=6, k=4, hosc_ortho=True)
    l2 = p2.apply(params, batch).loss
    ortho_key = next(k for k in l1 if "ortho" in k)
    assert float(l1[ortho_key]) != float(l2[ortho_key])


def test_jb_loss_coeff_and_normalize(batch):
    p1 = get_pooler("jb", in_channels=6, k=4, loss_coeff=1.0)
    params = p1.init(jax.random.key(0), batch)
    l1 = float(next(iter(p1.apply(params, batch).loss.values())))
    p2 = get_pooler("jb", in_channels=6, k=4, loss_coeff=2.5)
    l2 = float(next(iter(p2.apply(params, batch).loss.values())))
    np.testing.assert_allclose(l2, 2.5 * l1, rtol=1e-5)
    p3 = get_pooler("jb", in_channels=6, k=4, normalize_loss=False)
    l3 = float(next(iter(p3.apply(params, batch).loss.values())))
    assert l3 != l1


def test_diff_loss_coeffs(batch):
    p1 = get_pooler("diff", in_channels=6, k=4)
    params = p1.init(jax.random.key(0), batch)
    l1 = p1.apply(params, batch).loss
    p2 = get_pooler("diff", in_channels=6, k=4, link_loss_coeff=2.0,
                    ent_loss_coeff=3.0)
    l2 = p2.apply(params, batch).loss
    link_key = next(k for k in l1 if "link" in k)
    ent_key = next(k for k in l1 if "ent" in k)
    np.testing.assert_allclose(float(l2[link_key]),
                               2.0 * float(l1[link_key]), rtol=1e-5)
    np.testing.assert_allclose(float(l2[ent_key]),
                               3.0 * float(l1[ent_key]), rtol=1e-5)


# ----------------------------------------------------------------- nopool
def test_nopool_is_identity(batch):
    pooler = get_pooler("nopool")
    out = pooler(batch)
    np.testing.assert_allclose(np.asarray(out.graph.x),
                               np.asarray(batch.x), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(out.graph.senders),
                                  np.asarray(batch.senders))
    # lift is identity too
    lifted = pooler(batch, lifting=True, so=out.so, x=out.graph.x)
    np.testing.assert_allclose(np.asarray(lifted), np.asarray(batch.x),
                               rtol=1e-6)


# -------------------------------------------------------------- GraphLoader
def _graphs(n=10, seed=0):
    gs = []
    for i in range(n):
        x, ei = erdos_renyi_graph(6 + (i % 5), p=0.4, num_features=3,
                                  seed=seed + i)
        gs.append((x, ei))
    return gs


def test_loader_static_shapes_and_labels():
    from tgp_tpu.data.loaders import GraphLoader

    gs = _graphs(10)
    labels = np.arange(10)
    loader = GraphLoader(gs, labels, batch_size=4)
    shapes = set()
    seen = []
    for b, y in loader:
        shapes.add((b.x.shape, b.senders.shape))
        seen.extend(np.asarray(y).tolist())
    assert len(shapes) == 1  # static shapes across batches
    assert set(seen) <= set(range(10))


def test_loader_shuffle_reproducible():
    from tgp_tpu.data.loaders import GraphLoader

    gs = _graphs(10)
    labels = np.arange(10)

    def order(seed):
        loader = GraphLoader(gs, labels, batch_size=4, shuffle=True,
                             seed=seed)
        out = []
        for _, y in loader:
            out.extend(np.asarray(y).tolist())
        return out

    assert order(3) == order(3)
    assert order(3) != order(4)


def test_loader_explicit_budgets():
    from tgp_tpu.data.loaders import GraphLoader

    gs = _graphs(6)
    loader = GraphLoader(gs, batch_size=3, pad_nodes=64, pad_edges=256,
                         max_nodes=16)
    b = next(iter(loader))
    assert b.x.shape[0] == 64
    assert b.senders.shape[0] == 256
    assert b.max_nodes == 16


# -------------------------------------------------------------- checkpoint
def test_checkpoint_overwrite(tmp_path):
    """save_params(force=True) overwrites; restore returns the latest."""
    from tgp_tpu.utils.checkpoint import restore_params, save_params

    p1 = {"w": jnp.ones((3, 3)), "b": jnp.zeros(3)}
    p2 = {"w": 2 * jnp.ones((3, 3)), "b": jnp.ones(3)}
    save_params(str(tmp_path / "ck"), p1)
    save_params(str(tmp_path / "ck"), p2)
    got = restore_params(str(tmp_path / "ck"), like=p1)
    np.testing.assert_allclose(np.asarray(got["w"]), 2.0)


# --------------------------------------------------------------- eigenpool
@pytest.mark.parametrize("modes", [1, 3])
def test_eigen_num_modes(modes, batch):
    pooler = get_pooler("eigen", in_channels=6, k=3, num_modes=modes)
    out = pooler(batch)
    # pooled feature dim = modes * F
    assert out.graph.x.shape[-1] == modes * 6
