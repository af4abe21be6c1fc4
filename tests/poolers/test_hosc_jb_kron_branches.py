"""HOSC/JB hyperparameter branch matrices and cross-operator Kron
composability (reference: tests/poolers/test_hoscpool.py,
test_justbalance.py, test_kmis.py::test_kmis_with_kron_connect)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from tgp_tpu.poolers import get_pooler
from tests.utils_graphs import make_batch

K = 4


@pytest.fixture(scope="module")
def batch():
    return make_batch([9, 6, 12], num_features=7, seed=3, weighted=True,
                      pad_nodes=32, pad_edges=160)


# ---------------------------------------------------------------- HOSC


@pytest.mark.parametrize("batched", [True, False])
@pytest.mark.parametrize("alpha", [0.0, 0.5, 1.0])
def test_hosc_alpha_mixture(batch, alpha, batched):
    """α blends first-order and motif-A³ cuts; the extremes must match the
    pure losses (reference hosc.py:269-315)."""
    pooler = get_pooler("hosc", in_channels=7, k=K, alpha=alpha,
                        batched=batched)
    params = pooler.init(jax.random.key(0), batch)
    out = pooler.apply(params, batch)
    hosc = float(out.loss["hosc_loss"])
    assert np.isfinite(hosc)
    lo = get_pooler("hosc", in_channels=7, k=K, alpha=0.0, batched=batched)
    hi = get_pooler("hosc", in_channels=7, k=K, alpha=1.0, batched=batched)
    cut = float(lo.apply(params, batch).loss["hosc_loss"])
    ho = float(hi.apply(params, batch).loss["hosc_loss"])
    np.testing.assert_allclose(hosc, (1 - alpha) * cut + alpha * ho,
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("batched", [True, False])
def test_hosc_mu_zero_kills_ortho(batch, batched):
    pooler = get_pooler("hosc", in_channels=7, k=K, mu=0.0, batched=batched)
    params = pooler.init(jax.random.key(0), batch)
    out = pooler.apply(params, batch)
    assert float(out.loss["ortho_loss"]) == 0.0


@pytest.mark.parametrize("hosc_ortho", [True, False])
def test_hosc_ortho_variant_twins(batch, hosc_ortho):
    """Both orthogonality variants keep batched/unbatched parity."""
    pb = get_pooler("hosc", in_channels=7, k=K, hosc_ortho=hosc_ortho,
                    batched=True)
    pu = get_pooler("hosc", in_channels=7, k=K, hosc_ortho=hosc_ortho,
                    batched=False)
    params = pb.init(jax.random.key(0), batch)
    lb = pb.apply(params, batch).loss
    lu = pu.apply(params, batch).loss
    np.testing.assert_allclose(float(lb["ortho_loss"]),
                               float(lu["ortho_loss"]), rtol=5e-4, atol=5e-4)
    # the two variants measure different things — they must actually differ
    other = get_pooler("hosc", in_channels=7, k=K,
                       hosc_ortho=not hosc_ortho, batched=True)
    lo = other.apply(params, batch).loss
    assert float(lb["ortho_loss"]) != float(lo["ortho_loss"])


# ---------------------------------------------------------------- JB


@pytest.mark.parametrize("batched", [True, False])
@pytest.mark.parametrize("normalize", [True, False])
def test_jb_normalize_branches(batch, normalize, batched):
    pooler = get_pooler("jb", in_channels=7, k=K, normalize_loss=normalize,
                        batched=batched)
    params = pooler.init(jax.random.key(0), batch)
    out = pooler.apply(params, batch)
    val = float(out.loss["balance_loss"])
    assert np.isfinite(val)
    assert val < 0  # −Tr√(SᵀS) of a softmax S is strictly negative


def test_jb_normalized_vs_raw_scale(batch):
    """Per-graph normalization divides by √(n_g·K); with equal graphs the
    raw loss is the normalized one scaled back up."""
    n = 8
    b = make_batch([n, n], num_features=7, seed=5, pad_nodes=16,
                   pad_edges=96)
    p_norm = get_pooler("jb", in_channels=7, k=K, normalize_loss=True)
    p_raw = get_pooler("jb", in_channels=7, k=K, normalize_loss=False)
    params = p_norm.init(jax.random.key(0), b)
    v_norm = float(p_norm.apply(params, b).loss["balance_loss"])
    v_raw = float(p_raw.apply(params, b).loss["balance_loss"])
    np.testing.assert_allclose(v_raw, v_norm * np.sqrt(n * K), rtol=1e-4)


def test_jb_data_transforms_hook(batch):
    """JB ships NormalizeAdj(0.85) as its pre-transform
    (reference just_balance.py:303-322)."""
    from tgp_tpu.data.transforms import NormalizeAdj

    tf = get_pooler("jb", in_channels=7, k=K).data_transforms()
    assert isinstance(tf, NormalizeAdj)
    assert tf.delta == pytest.approx(0.85)


def test_jb_loss_coeff(batch):
    p1 = get_pooler("jb", in_channels=7, k=K, loss_coeff=1.0)
    params = p1.init(jax.random.key(0), batch)
    v1 = float(p1.apply(params, batch).loss["balance_loss"])
    p3 = get_pooler("jb", in_channels=7, k=K, loss_coeff=3.0)
    v3 = float(p3.apply(params, batch).loss["balance_loss"])
    np.testing.assert_allclose(v3, 3 * v1, rtol=1e-6)


# ------------------------------------------------- KMIS × KronConnect


def test_kmis_with_kron_reduction():
    """Compose KMIS selection with Kron-reduction connect (the reference
    swaps KMISPooling.connector = KronConnect(),
    tests/poolers/test_kmis.py:401-474): MIS nodes are kept, the rest is
    eliminated through the Laplacian Schur complement."""
    from tgp_tpu.graph import from_graphs
    from tgp_tpu.precoarsen.common import laplacian_csr
    from tgp_tpu.precoarsen.ndp import kron_reduction

    N = 10
    rng = np.random.default_rng(0)
    x = rng.normal(size=(N, 8)).astype(np.float32)
    fwd = np.stack([np.arange(N), np.roll(np.arange(N), -1)])
    ei = np.concatenate([fwd, fwd[::-1]], 1)  # undirected 10-cycle
    b = from_graphs([(x, ei)])

    pooler = get_pooler("kmis", in_channels=8, order_k=2, scorer="degree")
    params = pooler.init(jax.random.key(0), b)
    so = pooler.apply(params, b).so
    mis = np.asarray(so.extras["mis"])
    nm = np.asarray(b.node_mask)
    keep = np.nonzero(mis & nm)[0]
    drop = np.nonzero(~mis & nm)[0]
    assert 2 <= keep.size <= 4  # 2-MIS of a 10-cycle has ceil(10/5)..3 nodes

    L, _ = laplacian_csr(np.asarray(ei), N)
    A_pool = kron_reduction(L, keep, drop)
    k = keep.size
    assert A_pool.shape == (k, k)
    dense = A_pool.toarray()
    # Kron reduction of a connected cycle keeps the coarse graph connected
    # and symmetric with positive weights and no self-loops
    assert (dense >= 0).all() and dense.sum() > 0
    np.testing.assert_allclose(np.diag(dense), 0.0)
    np.testing.assert_allclose(dense, dense.T, rtol=1e-6, atol=1e-8)
    nc = sp.csgraph.connected_components(sp.csr_matrix(dense))[0]
    assert nc == 1
