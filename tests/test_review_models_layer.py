"""Models/datasets/utils/losses review regressions: twin normalizer parity,
empty-graph loss guards, cache-hash shape separators, dataset contract
enforcement, predictor rank consistency."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tgp_tpu.graph import from_graphs


def _ring(n, f=4, seed=0):
    rng = np.random.default_rng(seed)
    src = np.arange(n)
    ei = np.stack([np.r_[src, (src + 1) % n], np.r_[(src + 1) % n, src]])
    return rng.standard_normal((n, f)).astype(np.float32), ei


def test_link_pred_twins_agree_on_padded_batch():
    """Dense normalizer must be the masked Σ n_g², like the sparse twin."""
    from tgp_tpu.graph import to_dense
    from tgp_tpu.losses import link_pred_loss, sparse_link_pred_loss

    gs = [_ring(4), _ring(8, seed=1)]
    b = from_graphs(gs)
    d = to_dense(b)
    rng = np.random.default_rng(2)
    S = jax.nn.softmax(jnp.asarray(
        rng.standard_normal((2, d.adj.shape[1], 3))), axis=-1)
    S = S * d.mask[..., None]
    # flat S rows in sparse layout
    S_flat = S[b.node_graph, b.node_pos]
    S_flat = jnp.where(b.node_mask[:, None], S_flat, 0.0)
    dense = link_pred_loss(S, d.adj, mask=d.mask)
    sparse = sparse_link_pred_loss(
        S_flat, b.senders, b.receivers, b.edge_weight, b.node_graph,
        b.num_graphs, b.node_mask)
    np.testing.assert_allclose(float(dense), float(sparse), rtol=1e-5)


@pytest.mark.parametrize("fn_name", ["just_balance_loss",
                                     "hosc_orthogonality_loss"])
def test_masked_losses_finite_for_empty_mask_row(fn_name):
    import tgp_tpu.losses as L

    fn = getattr(L, fn_name)
    rng = np.random.default_rng(0)
    S = jax.nn.softmax(jnp.asarray(rng.standard_normal((2, 4, 3))), -1)
    mask = jnp.asarray([[True] * 4, [False] * 4])
    S = S * mask[..., None]
    out = fn(S, mask=mask)
    assert np.isfinite(float(out))


def test_just_balance_twin_parity_with_empty_graph_row():
    from tgp_tpu.losses import just_balance_loss, unbatched_just_balance_loss

    rng = np.random.default_rng(1)
    S = jax.nn.softmax(jnp.asarray(rng.standard_normal((2, 4, 3))), -1)
    mask = jnp.asarray([[True] * 4, [False] * 4])
    Sm = S * mask[..., None]
    dense = just_balance_loss(Sm, mask=mask)
    S_flat = Sm.reshape(-1, 3)
    node_graph = jnp.repeat(jnp.arange(2), 4)
    sparse = unbatched_just_balance_loss(
        S_flat, node_graph, 2, node_mask=mask.reshape(-1))
    np.testing.assert_allclose(float(dense), float(sparse), rtol=1e-5)


def test_graph_hash_shape_and_boundary_separators():
    from tgp_tpu.utils.checkpoint import PrecoarsenCache

    x = np.arange(8, dtype=np.float32)
    ei = np.array([[0, 1], [1, 0]])
    h42 = PrecoarsenCache.graph_hash(x.reshape(4, 2), ei)
    h24 = PrecoarsenCache.graph_hash(x.reshape(2, 4), ei)
    assert h42 != h24
    # x/edge_index boundary shifts must also differ
    a = PrecoarsenCache.graph_hash(np.zeros((2, 2), np.float32),
                                   np.array([[0], [1]]))
    bb = PrecoarsenCache.graph_hash(np.zeros((1, 2), np.float32),
                                    np.array([[0, 0], [0, 1]]))
    assert a != bb


def test_prepare_batch_class_error_names_class():
    from tgp_tpu.graph import to_dense
    from tgp_tpu.models.prepare import prepare_batch
    from tgp_tpu.poolers.graclus import GraclusPooling

    b = from_graphs([_ring(6)])
    d = to_dense(b)
    with pytest.raises(ValueError, match="GraclusPooling"):
        prepare_batch(d, pooler=GraclusPooling)  # class, not instance


def test_random_regular_contract_errors():
    from tgp_tpu.datasets.pygsp import _random_regular

    rng = np.random.default_rng(0)
    with pytest.raises(ValueError, match="even"):
        _random_regular(5, rng, k=5)
    with pytest.raises(ValueError, match="k < n"):
        _random_regular(4, rng, k=4)
    W, coords, y = _random_regular(12, rng, k=4)
    assert (W.sum(1) == 4).all()


def test_csbm_raises_when_connectivity_unreachable():
    from tgp_tpu.datasets.csbm import CSBMDataset

    with pytest.raises(RuntimeError, match="disconnected"):
        CSBMDataset(num_graphs=1, num_nodes=30, num_communities=3,
                    p_in=0.3, p_out=0.0, max_retries=3, seed=0)
    ds = CSBMDataset(num_graphs=1, num_nodes=30, num_communities=3,
                     p_in=0.3, p_out=0.0, max_retries=3, seed=0,
                     require_connected=False)
    assert len(ds) == 1


def test_predictor_empty_input_rank_consistent():
    from tgp_tpu.models.classifiers import PoolingClassifier
    from tgp_tpu.models.inference import Predictor
    from tgp_tpu.poolers import get_pooler

    model = PoolingClassifier(pooler=get_pooler("topk", in_channels=16),
                              num_classes=3, hidden=16)
    g = _ring(6, f=4)
    b0 = from_graphs([g])
    params = model.init(jax.random.PRNGKey(0), b0)

    pred = Predictor(lambda p, batch: model.apply(p, batch)[0], params,
                     batch_size=2)
    empty_before = pred([])
    assert empty_before.shape == (0,)  # width unknown yet
    out = pred([g, _ring(5, f=4, seed=1)])
    assert out.shape == (2, 3)
    empty_after = pred([])
    assert empty_after.shape == (0, 3)
    np.testing.assert_array_equal(
        np.concatenate([out, empty_after]), out)
