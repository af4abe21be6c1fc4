"""Pallas TPU kernel: batched small-matrix matmul (the dense-GNN core).

Motivation (RESULTS.md round-2 chip-envelope study): XLA lowers the dense
message-passing einsum ``[B, N, N] @ [B, N, F]`` to a batched-GEMM that
tops out at ~4.5-7 TF/s on v5e for pooling-scale operands (N≈256, F≈128)
— an order of magnitude under the MXU peak, and ~6x over the HBM-roofline
time for the same traffic.  The batch dimension defeats XLA's large-GEMM
tiling: each [256, 256]x[256, 128] product is a handful of MXU passes, and
the per-product prologue dominates.

This kernel restores the roofline: grid over batch blocks, one fused DMA
per block (automatic via BlockSpec, double-buffered by the Pallas
pipeline), and an unrolled run of 2-D MXU ``dot``s per block.  Inputs are
fed to the MXU in bf16 (the dense-path convention — adjacency values are
degree products, features bf16-safe); accumulation stays f32 via
``preferred_element_type``.

``trans_a`` contracts over ``a``'s row dim instead (``aᵀ @ b`` per batch
element) *inside* the kernel — the backward pass needs ``Aᵀg`` / ``g bᵀ``
and materializing HBM transposes would cost more than the matmul.

No reference analogue (the reference's dense poolers lean on cuBLAS
batched GEMM, which has no such small-batch cliff on GPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = ["bmm_pallas"]


def _kernel(a_ref, b_ref, o_ref, *, block_b, trans_a, trans_b):
    for i in range(block_b):
        a = a_ref[i]
        b = b_ref[i]
        if trans_a:      # contract a's leading dim: out = a^T @ b
            dn = (((0,), (0,)), ((), ()))
        elif trans_b:    # contract b's trailing dim: out = a @ b^T
            dn = (((1,), (1,)), ((), ()))
        else:
            dn = (((1,), (0,)), ((), ()))
        o_ref[i] = jax.lax.dot_general(
            a.astype(jnp.bfloat16), b.astype(jnp.bfloat16), dn,
            preferred_element_type=jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def bmm_pallas(a: jax.Array, b: jax.Array, trans_a: bool = False,
               trans_b: bool = False, block_b: int = 8,
               interpret: bool = False) -> jax.Array:
    """``out[i] = op_a(a[i]) @ op_b(b[i])`` for stacked square-ish matrices.

    ``a [B, N, M]``, ``b [B, M, F]`` (pre-transpose shapes), out
    ``[B, N, F]`` f32.  MXU compute in bf16 with f32 accumulation; for
    exact-f32 needs use the XLA einsum instead.  Gradients flow to both
    operands (bf16-rounded like the forward).
    """
    return _bmm_fwd_impl(a, b, trans_a, trans_b, block_b, interpret)


def _bmm_fwd_impl(a, b, trans_a, trans_b, block_b, interpret):
    B = a.shape[0]
    N = a.shape[2] if trans_a else a.shape[1]
    F = b.shape[1] if trans_b else b.shape[2]
    while B % block_b:  # static fallback for ragged batch counts
        block_b //= 2
    grid = (B // block_b,)
    spec = lambda s: pl.BlockSpec((block_b, *s), lambda g: (g, 0, 0))
    return pl.pallas_call(
        functools.partial(_kernel, block_b=block_b, trans_a=trans_a,
                          trans_b=trans_b),
        grid=grid,
        in_specs=[spec(a.shape[1:]), spec(b.shape[1:])],
        out_specs=spec((N, F)),
        out_shape=jax.ShapeDtypeStruct((B, N, F), jnp.float32),
        interpret=interpret,
    )(a, b)


def _bmm_fwd(a, b, trans_a, trans_b, block_b, interpret):
    return _bmm_fwd_impl(a, b, trans_a, trans_b, block_b, interpret), (a, b)


def _bmm_bwd(trans_a, trans_b, block_b, interpret, res, g):
    a, b = res
    # out = op_a(a) @ op_b(b); da/db are the usual GEMM adjoints, expressed
    # with in-kernel transposes so no [B, N, M] HBM transpose materializes.
    if not trans_a and not trans_b:
        da = bmm_pallas(g, b, False, True, block_b, interpret)      # g @ b^T
        db = bmm_pallas(a, g, True, False, block_b, interpret)      # a^T @ g
    elif trans_a and not trans_b:
        # out = a^T @ b -> da = (g @ b^T)^T = b @ g^T ; db = a @ g
        da = bmm_pallas(b, g, False, True, block_b, interpret)
        db = bmm_pallas(a, g, False, False, block_b, interpret)
    elif trans_b and not trans_a:
        # out = a @ b^T -> da = g @ b ; db = g^T @ a
        da = bmm_pallas(g, b, False, False, block_b, interpret)
        db = bmm_pallas(g, a, True, False, block_b, interpret)
    else:  # pragma: no cover - double transpose unused
        raise NotImplementedError("trans_a and trans_b together")
    return da.astype(a.dtype), db.astype(b.dtype)


bmm_pallas.defvjp(_bmm_fwd, _bmm_bwd)
