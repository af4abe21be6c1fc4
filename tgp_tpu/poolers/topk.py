"""Top-k pooling operator (reference: ``TopkPooling``,
tgp/poolers/topk.py:14-195; Gao & Ji 2019 / Cangea et al. 2018 / Knyazev
et al. 2019).

Composition: TopkSelect / BaseReduce / SparseConnect / BaseLift.  Pooled
features are the selected nodes' features scaled by their score (the reduce
path with one-node clusters) times ``multiplier``.
"""

from __future__ import annotations

from typing import Callable, Optional, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from tgp_tpu.connect.base import ConnectConfig
from tgp_tpu.graph import DenseGraphBatch, GraphBatch
from tgp_tpu.ops.sparse import postprocess_adj_dense
from tgp_tpu.select.base import SelectOutput
from tgp_tpu.select.topk import TopkSelect, dense_topk_indices
from tgp_tpu.src import PoolingOutput, SRCPooling

__all__ = ["TopkPooling", "dense_topk_pool", "dense_topk_apply",
           "gather_rows"]


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


def dense_topk_apply(dense: DenseGraphBatch, idx: jax.Array,
                     slot_mask: jax.Array, gate: jax.Array,
                     multiplier: float = 1.0,
                     impl: str = "auto") -> DenseGraphBatch:
    """Apply a precomputed dense top-k selection (``idx [B,K]``,
    ``slot_mask [B,K]``, ``gate [B,K]``, from
    :func:`~tgp_tpu.select.topk.dense_topk_indices`): gate kept features by
    their score and pool the adjacency — all scatter-free.

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
    K = idx.shape[1]
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


def dense_topk_pool(dense: DenseGraphBatch, score: jax.Array,
                    ratio: float = 0.5, multiplier: float = 1.0,
                    impl: str = "auto") -> DenseGraphBatch:
    """Dense top-k pooling from an (already activated) ``score [B, N]``:
    rank (:func:`~tgp_tpu.select.topk.dense_topk_indices`) then pool
    (:func:`dense_topk_apply`)."""
    idx, slot_mask, gate = dense_topk_indices(score, dense.mask, ratio)
    return dense_topk_apply(dense, idx, slot_mask, gate, multiplier, impl)


class TopkPooling(SRCPooling):
    in_channels: Optional[int] = None
    ratio: Union[int, float] = 0.5
    min_score: Optional[float] = None
    act: Union[str, Callable, None] = "tanh"
    multiplier: float = 1.0
    s_inv_op: str = "transpose"
    connect_red_op: str = "sum"
    remove_self_loops: bool = True
    degree_norm: bool = False
    edge_weight_norm: bool = False
    #: sparse-world pooled-graph layout (round-5 large-graph redesign):
    #:   * ``"compact"`` — relabel kept nodes into the ``[B·Kmax]``
    #:     supernode space (reference semantics, tgp/poolers/topk.py:
    #:     124-193: ``A' = A[kept, kept]``).  The relabel gathers + the
    #:     post-layer's unsorted-scatter SpMM cost ~90 ms at E=1M
    #:     (scripts/exp_r5_step_trace.py --large).
    #:   * ``"masked"`` — keep the ORIGINAL node space: gate kept features
    #:     by their score and shrink ``node_mask`` to the selection.  The
    #:     pooled graph reuses the input's receiver-sorted layout and
    #:     static CSR metadata, so downstream convs stay on the Pallas
    #:     fast path with scatter-free backward.  Mathematically the same
    #:     pooled graph (the induced kept-node subgraph, identically
    #:     gated), just not compacted — consumers must respect
    #:     ``node_mask`` (every tgp_tpu op does).
    #:   * ``"auto"`` — masked exactly in the regime where the compact
    #:     relabel is the bottleneck: sorted edges + collator CSR aux +
    #:     E ≥ PALLAS_MIN_EDGES + TPU backend; compact otherwise.
    pool_mode: str = "auto"

    IS_TRAINABLE = True
    IS_PRECOARSENABLE = False
    ACCEPTS_DENSE_BATCH = True  # dense fast path below

    def setup(self):
        self.selector = TopkSelect(
            in_channels=self.in_channels,
            ratio=self.ratio,
            min_score=self.min_score,
            act=self.act,
            s_inv_op=self.s_inv_op,
        )

    def _connect_cfg(self) -> ConnectConfig:
        return ConnectConfig(
            reduce_op=self.connect_red_op,
            remove_self_loops=self.remove_self_loops,
            degree_norm=self.degree_norm,
            edge_weight_norm=self.edge_weight_norm,
        )

    def __call__(self, batch: Union[GraphBatch, DenseGraphBatch], *,
                 so: Optional[SelectOutput] = None,
                 lifting: bool = False, x: Optional[jax.Array] = None,
                 pool_impl: str = "auto",
                 ) -> Union[PoolingOutput, jax.Array]:
        if lifting:
            return self.lift(x if x is not None else batch.x, so)
        if isinstance(batch, DenseGraphBatch):
            # scatter-free dense fast path (model-level regime map,
            # ops/sparse.py::use_dense_pipeline): same selection math as the
            # sparse branch — shared selector params — but pooled with
            # gathers / MXU one-hot matmuls instead of scatter+coalesce.
            # Semantics match the sparse branch exactly: the pooled
            # adjacency is the kept-node subgraph ``A[idx, idx]``
            # (reference ``sparse_connect`` partial-selection regime,
            # tgp/connect/base_conn.py:57-112) plus the same postprocess.
            if so is None:
                so = self.selector(batch)
            pooled = dense_topk_apply(
                batch, so.extras["idx"], so.extras["slot_mask"],
                so.extras["gate"], multiplier=self.multiplier,
                impl=pool_impl)
            adj = postprocess_adj_dense(
                pooled.adj,
                remove_self_loops_flag=self.remove_self_loops,
                degree_norm=self.degree_norm,
                edge_weight_norm=self.edge_weight_norm,
            )
            return PoolingOutput(so=so, dense=pooled.replace(adj=adj))
        if so is None:
            so = self.selector(batch)
        if self._use_masked(batch):
            return self._masked_pool(batch, so)
        x_pool = self.reduce(batch.x, so) * self.multiplier
        edges = self.connect(batch, so, self._connect_cfg())
        pooled = self.pooled_graph(x_pool, edges, so, batch)
        return PoolingOutput(so=so, graph=pooled)

    # ---- masked (in-place) sparse pooling (shared helpers: _masked.py) ---
    def _use_masked(self, batch: GraphBatch) -> bool:
        from tgp_tpu.poolers._masked import use_masked_pool

        return use_masked_pool(self.pool_mode, batch,
                               degree_norm=self.degree_norm,
                               edge_weight_norm=self.edge_weight_norm)

    def _masked_pool(self, batch: GraphBatch,
                     so: SelectOutput) -> PoolingOutput:
        from tgp_tpu.poolers._masked import masked_pool

        return masked_pool(batch, so, multiplier=self.multiplier,
                           remove_self_loops=self.remove_self_loops)

    def lift(self, x_pool: jax.Array, so: SelectOutput) -> jax.Array:
        if so.extras.get("pool_mode") == "masked":
            from tgp_tpu.poolers._masked import masked_lift

            return masked_lift(x_pool, so, self.s_inv_op)
        return super().lift(x_pool, so)
