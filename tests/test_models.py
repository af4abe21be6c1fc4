"""Model-level composition tests: pool→lift autoencoder across pooler
families, clustering model S output, classifier with dense poolers
(reference coverage model: examples/node_class.py:88-141 +
tests/poolers forward contracts)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.utils_graphs import make_batch
from tgp_tpu.models.autoencoder import PoolLiftNodeClassifier
from tgp_tpu.models.classifiers import PoolingClassifier
from tgp_tpu.models.clustering import ClusteringModel
from tgp_tpu.poolers import get_pooler


@pytest.fixture(scope="module")
def batch():
    return make_batch([10, 8], num_features=5, seed=51)


@pytest.mark.parametrize("alias", ["topk", "graclus", "mincut"])
def test_pool_lift_autoencoder(alias, batch):
    pooler = get_pooler(alias, in_channels=64, ratio=0.5, k=4)
    model = PoolLiftNodeClassifier(pooler=pooler, num_classes=3, hidden=64)
    params = model.init(jax.random.key(0), batch)
    logits, out = model.apply(params, batch)
    assert logits.shape == (batch.num_nodes, 3)
    assert np.isfinite(np.asarray(logits)).all()
    # gradients flow end-to-end through pool AND lift
    def loss(p):
        lg, o = model.apply(p, batch)
        return jnp.sum(lg ** 2)
    g = jax.grad(loss)(params)
    nz = sum(bool(jnp.any(l != 0)) for l in jax.tree_util.tree_leaves(g))
    assert nz >= len(jax.tree_util.tree_leaves(g)) // 2


@pytest.mark.parametrize("alias", ["mincut", "dmon"])
def test_clustering_model_s(alias, batch):
    pooler = get_pooler(alias, in_channels=32, k=4)
    model = ClusteringModel(pooler=pooler, hidden=32)
    params = model.init(jax.random.key(0), batch)
    S, out = model.apply(params, batch)
    S = np.asarray(S)
    nm = np.asarray(batch.node_mask)
    # rows are a distribution over clusters on valid nodes
    if S.ndim == 3:
        ng, npos = np.asarray(batch.node_graph), np.asarray(batch.node_pos)
        rows = S[ng[nm], npos[nm]]
    else:
        rows = S[nm]
    np.testing.assert_allclose(rows.sum(-1), 1.0, rtol=1e-4)


@pytest.mark.parametrize("alias", ["diff", "hosc"])
def test_classifier_with_dense_pooler(alias, batch):
    pooler = get_pooler(alias, in_channels=32, k=4)
    model = PoolingClassifier(pooler=pooler, num_classes=4, hidden=32)
    params = model.init(jax.random.key(0), batch)
    logits, out = model.apply(params, batch)
    assert logits.shape == (2, 4)
    assert out.loss  # aux losses surface through the model
    total = out.loss_sum()
    assert np.isfinite(float(total))


@pytest.mark.parametrize("dense_path", [False, True])
def test_remat_gradient_invariance(batch, dense_path):
    """remat=True must reproduce the exact same loss and gradients as
    remat=False (jax.checkpoint only changes the backward schedule, never
    the math) — the HBM-vs-FLOPs knob on deep MP stacks."""
    if dense_path:
        from tgp_tpu.graph import to_dense
        from tgp_tpu.models.fast_dense import DenseTopkClassifier

        d = to_dense(batch)
        models = [DenseTopkClassifier(num_classes=3, hidden=16, ratio=0.5,
                                      num_pre_layers=2, num_post_layers=2,
                                      remat=r) for r in (False, True)]
        inp = d
    else:
        models = [PoolingClassifier(
            pooler=get_pooler("topk", in_channels=16, ratio=0.5),
            num_classes=3, hidden=16, num_pre_layers=2, num_post_layers=2,
            remat=r) for r in (False, True)]
        inp = batch

    params = models[0].init(jax.random.key(0), inp)
    y = jnp.zeros(batch.num_graphs, jnp.int32)

    def loss_fn(model, p):
        logits = model.apply(p, inp)[0]
        import optax
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, y).mean()

    l0, g0 = jax.value_and_grad(lambda p: loss_fn(models[0], p))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss_fn(models[1], p))(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_fast_dense_bf16_remat_combo(batch):
    """compute_dtype=bf16 composes with remat (the two TPU memory levers
    stack): jit forward and grads stay finite, logits come out f32."""
    from tgp_tpu.graph import to_dense
    from tgp_tpu.models.fast_dense import DenseTopkClassifier

    d = to_dense(batch)
    m = DenseTopkClassifier(num_classes=3, hidden=16,
                            compute_dtype=jnp.bfloat16, remat=True,
                            num_pre_layers=2)
    p = m.init(jax.random.key(0), d)
    logits, _ = jax.jit(lambda p, d: m.apply(p, d))(p, d)
    assert logits.dtype == jnp.float32
    assert np.isfinite(np.asarray(logits, np.float32)).all()
    g = jax.grad(lambda p: jnp.sum(
        m.apply(p, d)[0].astype(jnp.float32) ** 2))(p)
    assert all(np.isfinite(np.asarray(l, np.float32)).all()
               for l in jax.tree_util.tree_leaves(g))
