"""Scatter-free dense fast path for batches of small graphs.

TPU rationale (RESULTS.md round-2 kernel study): at the flagship bench scale
(64 graphs × 256 nodes, ~125k edges) one XLA scatter SpMM costs ~1.3 ms
while the equivalent dense per-graph bmm is ~free (<20 µs) — the MXU eats
``[B, N, N] × [B, N, F]`` for breakfast, and a dense-everything pipeline
needs ZERO scatters:

  * message passing  → batched matmul (``GCNConv`` dense path)
  * top-k selection  → ``jax.lax.top_k`` per graph (sort, no scatter)
  * connect          → two ``take_along_axis`` gathers of the dense adjacency
  * readout          → masked sum

The selection math is identical to the (oracle-verified) sparse
``TopkSelect`` — ``y = tanh(X·p/‖p‖)``, keep the per-graph top
``ceil(ratio·n_g)``, gate kept features by their score (reference:
tgp/select/topk_select.py:169-207) — just laid out densely.  Densify once
per batch (the input adjacency is static across steps); everything inside
the train step is matmul/gather.

Use this for ``max_nodes ≲ 2k``; beyond that the ``B·N²`` terms overtake
the sparse path (see ops/pallas/segment_spmm.py for that regime).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from tgp_tpu.graph import DenseGraphBatch
from tgp_tpu.mp.gcn import GCNConv
from tgp_tpu.reduce.global_reduce import global_reduce

__all__ = ["dense_topk_pool", "DenseTopkClassifier", "gather_rows"]


@jax.custom_vjp
def gather_rows(x: jax.Array, idx: jax.Array) -> jax.Array:
    """``out[b, j] = x[b, idx[b, j]]`` with a scatter-free backward.

    The default VJP of ``take_along_axis`` is an XLA scatter-add over the
    full ``[B, N, F]`` cotangent (~1.3 ms at the bench scale — as slow as
    the sparse scatter this pipeline exists to avoid).  Top-k indices are
    unique per row, so the backward is a *permutation*: build the inverse
    position table (one small ``[B, N]`` int32 scatter) and GATHER the
    cotangent through it.
    """
    return jnp.take_along_axis(x, idx[..., None], axis=1)


def _gather_rows_fwd(x, idx):
    return gather_rows(x, idx), (idx, x.shape)


def _gather_rows_bwd(res, g):
    idx, x_shape = res
    B, N, F = x_shape
    K = idx.shape[1]
    inv = jnp.full((B, N), K, jnp.int32)
    inv = inv.at[jnp.arange(B)[:, None], idx].set(
        jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32), (B, K)))
    g_pad = jnp.concatenate([g, jnp.zeros((B, 1, F), g.dtype)], axis=1)
    d_x = jnp.take_along_axis(g_pad, inv[..., None], axis=1)
    return d_x, None


gather_rows.defvjp(_gather_rows_fwd, _gather_rows_bwd)


def dense_topk_pool(dense: DenseGraphBatch, score: jax.Array,
                    ratio: float = 0.5, multiplier: float = 1.0,
                    impl: str = "auto") -> DenseGraphBatch:
    """Dense top-k pooling: ``score [B, N]`` (already activated), keep the
    per-graph top ``ceil(ratio·n_g)`` (≤ ``K = ceil(ratio·Nmax)`` static
    slots), gate kept features by their score, and pool the adjacency.

    ``impl``:
      * ``"onehot"`` — build the masked selection one-hot ``P [B, K, N]``
        and pool with MXU matmuls (``P·A·Pᵀ``, ``P·X``).  Measured 9×
        faster than the gathers at the flagship shape (B=64, N=256,
        K=128): the two adjacency ``take_along_axis`` cost ~126 µs vs
        ~14 µs for the matmul chain (scripts/exp_r3_ops.py, TPU v5e) —
        gathers run at memory latency, one-hot rides the MXU at >100 TF/s.
      * ``"gather"`` — two ``take_along_axis`` on the adjacency + the
        permutation-VJP :func:`gather_rows` on features.  Wins when the
        ``B·K·N²`` one-hot FLOPs exceed the ``B·N²`` gather bytes — i.e.
        for large K.
      * ``"auto"`` — onehot for ``K ≤ 512`` (MXU flops/byte balance ≈
        240 ≫ K at dense-path scales), gather beyond.
    """
    B, N, F = dense.x.shape
    K = max(int(math.ceil(ratio * N)), 1)
    neg = jnp.finfo(score.dtype).min
    ranked = jnp.where(dense.mask, score, neg)
    top_scores, idx = jax.lax.top_k(ranked, K)  # [B, K]

    n_g = dense.mask.sum(-1)
    k_g = jnp.maximum(jnp.ceil(ratio * n_g), 1).astype(jnp.int32)
    slot_mask = jnp.arange(K)[None, :] < k_g[:, None]  # [B, K]
    gate = jnp.where(slot_mask, top_scores, 0.0)

    if impl == "auto":
        impl = "onehot" if K <= 512 else "gather"

    if impl == "onehot":
        # masked selection one-hot: invalid slots are zero rows, so the
        # pooled adjacency/features are masked by construction
        P = (idx[:, :, None] == jnp.arange(N, dtype=idx.dtype)[None, None, :])
        P = jnp.where(slot_mask[:, :, None], P, False)
        Pa = P.astype(dense.adj.dtype)
        # HIGHEST on the adjacency chain too: a one-hot selection must
        # return adjacency VALUES exactly, and DEFAULT MXU precision
        # truncates f32 operands to bf16 (~1e-3 rel drift vs the gather
        # impl for weighted/normalized adjacencies — ADVICE r3).
        adj = jnp.einsum("bkn,bnm->bkm", Pa, dense.adj,
                         precision=jax.lax.Precision.HIGHEST,
                         preferred_element_type=jnp.float32)
        adj = jnp.einsum("bkm,bjm->bkj", adj.astype(dense.adj.dtype), Pa,
                         precision=jax.lax.Precision.HIGHEST,
                         preferred_element_type=jnp.float32
                         ).astype(dense.adj.dtype)
        # HIGHEST: on TPU, DEFAULT truncates f32 operands to bf16 — but a
        # one-hot selection must return the feature VALUES exactly.  For
        # bf16 features HIGHEST costs the same single MXU pass; for f32 it
        # is the exact 3-pass emulation (measured ~3 µs extra at the
        # flagship shape, scripts/exp_r3_ops2.py).
        x_sel = jnp.einsum("bkn,bnf->bkf", P.astype(dense.x.dtype), dense.x,
                           precision=jax.lax.Precision.HIGHEST)
        x_pool = x_sel * (gate[:, :, None] * multiplier).astype(x_sel.dtype)
        return DenseGraphBatch(x=x_pool, adj=adj, mask=slot_mask)

    x_sel = gather_rows(dense.x, idx)
    x_pool = x_sel * (gate[:, :, None] * multiplier).astype(x_sel.dtype)

    adj = jnp.take_along_axis(dense.adj, idx[:, :, None], axis=1)
    adj = jnp.take_along_axis(adj, idx[:, None, :], axis=2)
    m = slot_mask.astype(adj.dtype)
    adj = adj * m[:, :, None] * m[:, None, :]
    return DenseGraphBatch(x=x_pool, adj=adj, mask=slot_mask)


class DenseTopkClassifier(nn.Module):
    """GCN → top-k pool → GCN → readout, all dense (no scatters anywhere).

    Mirrors :class:`~tgp_tpu.models.classifiers.PoolingClassifier` with a
    topk pooler, but takes a :class:`DenseGraphBatch` (densify once per
    batch, outside the train step)."""

    num_classes: int
    hidden: int = 64
    ratio: float = 0.5
    num_pre_layers: int = 1
    num_post_layers: int = 1
    readout: str = "sum"
    #: the input adjacency is already GCN-normalized (normalize it ONCE
    #: outside the train step — it is static across steps); the pooled
    #: adjacency is a gathered subgraph and gets renormalized by the post
    #: layers either way
    pre_normalized: bool = False
    #: renormalize the pooled adjacency in the post layers (ablation knob)
    post_normalize: bool = True
    #: matmul compute dtype for the conv/dense stack (params stay f32);
    #: jnp.bfloat16 doubles MXU rate and halves feature HBM traffic
    compute_dtype: object = None
    #: skip per-layer padding masks (safe here: padding scores are masked at
    #: selection, padding rows are never gathered, and the readout is
    #: masked — saves 2 full [B,N,F] HBM passes per layer)
    fast_masks: bool = True
    #: route the adjacency matmul through the Pallas batched-GEMM kernel
    #: (ops/pallas/bmm.py) — XLA's bmm runs ~10x under roofline here
    use_pallas: bool = False
    #: rematerialize MP activations in the backward pass (jax.checkpoint):
    #: extra forward FLOPs for O(layers) less [B,N,F] activation HBM
    remat: bool = False
    #: pooling implementation: "auto" | "onehot" (MXU matmuls) | "gather"
    #: (take_along_axis) — see :func:`dense_topk_pool`
    pool_impl: str = "auto"

    @nn.compact
    def __call__(self, dense: DenseGraphBatch) -> Tuple[jax.Array, DenseGraphBatch]:
        Conv = nn.remat(GCNConv) if self.remat else GCNConv
        x = dense.x
        if self.compute_dtype is not None:
            x = x.astype(self.compute_dtype)
        for i in range(self.num_pre_layers):
            x = nn.relu(Conv(self.hidden,
                             normalize=not self.pre_normalized,
                             mask_output=not self.fast_masks,
                             use_pallas=self.use_pallas,
                             dtype=self.compute_dtype,
                             name=f"pre_conv_{i}")(dense, x))
        dense = DenseGraphBatch(x=x, adj=dense.adj, mask=dense.mask)

        # TopkSelect scoring (reference: tgp/select/topk_select.py:169-199)
        bound = 1.0 / math.sqrt(self.hidden)
        p = self.param(
            "p",
            lambda key, shape: jax.random.uniform(
                key, shape, minval=-bound, maxval=bound),
            (self.hidden,))
        score = jnp.tanh((x.astype(p.dtype) @ p)
                         / jnp.maximum(jnp.linalg.norm(p), 1e-12))
        pooled = dense_topk_pool(dense, score, self.ratio,
                                 impl=self.pool_impl)

        h = pooled.x
        for i in range(self.num_post_layers):
            h = nn.relu(Conv(self.hidden,
                             normalize=self.post_normalize,
                             mask_output=not self.fast_masks,
                             use_pallas=self.use_pallas,
                             dtype=self.compute_dtype,
                             name=f"post_conv_{i}")(pooled, h))
        z = global_reduce(h.astype(jnp.float32), mask=pooled.mask,
                          op=self.readout)
        z = nn.relu(nn.Dense(self.hidden)(z))
        logits = nn.Dense(self.num_classes)(z)
        return logits, pooled
