"""Dense-family hyperparameter knob matrix (VERDICT r2 #6): the shared
DenseClusterPooling knobs (adj_transpose, degree_norm, edge_weight_norm,
remove_self_loops, sparse_output, k) and every subclass's loss
coefficients, asserted semantically across the whole dense registry —
mincut, diff, dmon, hosc, jb, acc."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tgp_tpu.poolers import get_pooler
from tests.utils_graphs import make_batch

DENSE = ["mincut", "diff", "dmon", "hosc", "jb", "acc"]


@pytest.fixture(scope="module")
def batch():
    return make_batch([9, 12], num_features=5, seed=9, weighted=True)


def _run(alias, batch, seed=0, **kw):
    pooler = get_pooler(alias, in_channels=5, k=4, **kw)
    rngs = {"params": jax.random.key(seed)}
    params = pooler.init(rngs, batch)
    return pooler, params, pooler.apply(params, batch)


@pytest.mark.parametrize("alias", DENSE)
def test_k_controls_supernode_budget(alias, batch):
    _, _, out = _run(alias, batch)
    assert out.so.s.shape[-1] == 4
    _, _, out8 = _run(alias, batch)
    pooler = get_pooler(alias, in_channels=5, k=7)
    params = pooler.init(jax.random.key(0), batch)
    out7 = pooler.apply(params, batch)
    assert out7.so.s.shape[-1] == 7


@pytest.mark.parametrize("alias", DENSE)
def test_loss_dict_nonempty_and_finite(alias, batch):
    _, _, out = _run(alias, batch)
    assert out.loss, f"{alias} must expose aux losses"
    for k, v in out.loss.items():
        assert np.isfinite(float(v)), (alias, k)


@pytest.mark.parametrize("alias", ["mincut", "hosc", "jb"])
def test_loss_coefficients_scale_their_terms(alias, batch):
    """Doubling a loss coefficient doubles exactly that loss entry."""
    _, _, base = _run(alias, batch)
    coeff_names = {
        "mincut": {"cut_loss": "cut_loss_coeff",
                   "ortho_loss": "ortho_loss_coeff"},
        "hosc": None,
        "jb": None,
    }[alias]
    if coeff_names is None:
        # discover <name>_coeff fields from the class
        cls = type(get_pooler(alias, in_channels=5, k=4))
        coeff_names = {}
        for f in cls.__dataclass_fields__:
            if f.endswith("_coeff"):
                guess = f.replace("_coeff", "")
                for lk in base.loss:
                    if lk.startswith(guess) or guess.startswith(
                            lk.replace("_loss", "")):
                        coeff_names[lk] = f
    for loss_key, coeff in coeff_names.items():
        if loss_key not in base.loss:
            continue
        _, _, doubled = _run(alias, batch, **{coeff: 2.0})
        np.testing.assert_allclose(float(doubled.loss[loss_key]),
                                   2.0 * float(base.loss[loss_key]),
                                   rtol=1e-5, err_msg=f"{alias}.{coeff}")


@pytest.mark.parametrize("alias", ["mincut", "dmon"])
def test_adj_transpose_is_exact_transpose_on_directed(alias, batch):
    """adj_transpose=True pools the transposed adjacency: on a directed
    graph the pooled dense adjacency is EXACTLY the transpose of the
    flag-off result (reference semantics; docs/migration.md documents the
    default deviation — reference True, here False)."""
    s = np.asarray(batch.senders)
    r = np.asarray(batch.receivers)
    em = np.asarray(batch.edge_mask) & (s < r)  # directed half
    directed = batch.replace(edge_mask=jnp.asarray(em))
    _, params, out_f = _run(alias, directed)
    pooler_t = get_pooler(alias, in_channels=5, k=4, adj_transpose=True)
    out_t = pooler_t.apply(params, directed)
    af = np.asarray(out_f.dense.adj)
    at = np.asarray(out_t.dense.adj)
    assert not np.allclose(af, at)
    np.testing.assert_allclose(af, np.swapaxes(at, -1, -2), rtol=1e-5,
                               atol=1e-6)


@pytest.mark.parametrize("alias", ["mincut"])
def test_degree_norm_normalizes_pooled_adj_not_loss(alias, batch):
    """degree_norm applies D^{-1/2}AD^{-1/2} to the POOLED adjacency after
    the loss (losses consume the raw pooled adj, reference ops.py:282-335):
    the adjacency changes, the cut loss does not."""
    _, params, out_n = _run(alias, batch)
    pooler = get_pooler(alias, in_channels=5, k=4, degree_norm=False)
    out_raw = pooler.apply(params, batch)
    assert not np.allclose(np.asarray(out_n.dense.adj),
                           np.asarray(out_raw.dense.adj))
    np.testing.assert_allclose(float(out_n.loss["cut_loss"]),
                               float(out_raw.loss["cut_loss"]), rtol=1e-6)


@pytest.mark.parametrize("alias", ["mincut", "jb"])
def test_sparse_output_block_diag(alias, batch):
    """sparse_output=True finalizes a block-diagonal sparse GraphBatch
    instead of the dense pooled batch."""
    _, _, out = _run(alias, batch, sparse_output=True)
    g = out.graph
    assert hasattr(g, "senders"), "sparse output must be a GraphBatch"
    cg = np.asarray(g.node_graph)
    s = np.asarray(g.senders)
    r = np.asarray(g.receivers)
    em = np.asarray(g.edge_mask)
    # block-diagonal: every edge stays within one graph
    assert (cg[s[em]] == cg[r[em]]).all()


@pytest.mark.parametrize("alias", DENSE)
def test_pass_so_skips_selection_dense(alias, batch):
    pooler, params, out = _run(alias, batch)
    out2 = pooler.apply(params, batch, so=out.so)
    np.testing.assert_allclose(np.asarray(out.x), np.asarray(out2.x),
                               rtol=1e-6)


@pytest.mark.parametrize("alias", DENSE)
def test_lifting_shape_contract(alias, batch):
    pooler, params, out = _run(alias, batch)
    lifted = pooler.apply(params, batch, so=out.so, x=out.x, lifting=True)
    assert lifted.shape[0] in (batch.num_nodes,
                               batch.num_graphs * batch.max_nodes) or \
        lifted.ndim == 3
    assert np.isfinite(np.asarray(lifted)).all()
