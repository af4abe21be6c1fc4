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
