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
# canonical home is the pooler layer (TopkPooling's dense branch uses the
# same machinery); re-exported here for back-compat
from tgp_tpu.poolers.topk import (  # noqa: F401
    dense_topk_apply,
    dense_topk_pool,
    gather_rows,
)
from tgp_tpu.reduce.global_reduce import global_reduce

__all__ = ["dense_topk_pool", "dense_topk_apply", "DenseTopkClassifier",
           "gather_rows"]


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
