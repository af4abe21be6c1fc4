"""Pallas batched-GEMM kernel tests (interpret mode on CPU).

The kernel computes in bf16 with f32 accumulation, so the oracle is the
bf16 XLA einsum (bit-matched inputs) rather than the f32 product.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tgp_tpu.ops.pallas.bmm import bmm_pallas

BF16_TOL = dict(rtol=2e-2, atol=2e-2)


def _abf16(rng, shape):
    return jnp.asarray(rng.normal(size=shape).astype(np.float32))


def _ref(a, b):
    return jnp.einsum("bnm,bmf->bnf", a.astype(jnp.bfloat16),
                      b.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)


@pytest.mark.parametrize("B,N,F,block_b", [(8, 256, 128, 4), (6, 128, 128, 4),
                                           (4, 256, 256, 8)])
def test_bmm_matches_bf16_einsum(B, N, F, block_b):
    rng = np.random.default_rng(0)
    a, b = _abf16(rng, (B, N, N)), _abf16(rng, (B, N, F))
    out = bmm_pallas(a, b, block_b=block_b, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_ref(a, b)),
                               rtol=1e-6, atol=1e-6)


def test_bmm_trans_variants():
    rng = np.random.default_rng(1)
    a, b = _abf16(rng, (4, 256, 256)), _abf16(rng, (4, 256, 128))
    ref = np.asarray(_ref(a, b))
    o_ta = bmm_pallas(jnp.swapaxes(a, 1, 2), b, True, False, 4, True)
    o_tb = bmm_pallas(a, jnp.swapaxes(b, 1, 2), False, True, 4, True)
    np.testing.assert_allclose(np.asarray(o_ta), ref, **BF16_TOL)
    np.testing.assert_allclose(np.asarray(o_tb), ref, rtol=1e-6, atol=1e-6)


def test_bmm_grads_match_einsum():
    rng = np.random.default_rng(2)
    a, b = _abf16(rng, (4, 128, 128)), _abf16(rng, (4, 128, 128))

    def loss_p(a, b):
        return (bmm_pallas(a, b, False, False, 4, True) ** 2).sum()

    def loss_r(a, b):
        return (jnp.einsum("bnm,bmf->bnf", a, b) ** 2).sum()

    ga, gb = jax.grad(loss_p, (0, 1))(a, b)
    ra, rb = jax.grad(loss_r, (0, 1))(a, b)
    for g, r in [(ga, ra), (gb, rb)]:
        scale = float(jnp.max(jnp.abs(r)))
        assert float(jnp.max(jnp.abs(g - r))) / scale < 2e-2


def test_bmm_ragged_batch_falls_back_to_smaller_block():
    rng = np.random.default_rng(3)
    a, b = _abf16(rng, (6, 128, 128)), _abf16(rng, (6, 128, 128))
    # 6 % 8 != 0 -> kernel halves block_b until it divides (2)
    out = bmm_pallas(a, b, block_b=8, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_ref(a, b)),
                               rtol=1e-6, atol=1e-6)


def test_gcnconv_dense_pallas_path_matches_xla():
    from tgp_tpu.graph import DenseGraphBatch
    from tgp_tpu.mp.gcn import GCNConv

    rng = np.random.default_rng(4)
    B, N, F = 4, 128, 32
    adj = (rng.random((B, N, N)) < 0.05).astype(np.float32)
    adj = np.maximum(adj, adj.transpose(0, 2, 1))
    mask = np.ones((B, N), bool)
    mask[1, 100:] = False
    adj *= mask[:, None, :] * mask[:, :, None]
    dense = DenseGraphBatch(x=jnp.asarray(rng.normal(size=(B, N, F)),
                                          dtype=jnp.float32),
                            adj=jnp.asarray(adj), mask=jnp.asarray(mask))
    outs = {}
    for flag in (False, True):
        conv = GCNConv(16, use_pallas=flag)
        params = conv.init(jax.random.key(0), dense)
        outs[flag] = np.asarray(conv.apply(params, dense))
    np.testing.assert_allclose(outs[True], outs[False], **BF16_TOL)
