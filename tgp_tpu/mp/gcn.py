"""Message-passing layers for the hot loop: GCN and GraphConv.

These replace the reference examples' PyG ``GCNConv``/``GraphConv``/dense
twins (examples/classification.py:96-121).  Sparse path = SpMM
(gather + segment-sum) over the masked COO; dense path = batched matmul on
the MXU with mask-aware normalization.
"""

from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from tgp_tpu.graph import DenseGraphBatch, GraphBatch
from tgp_tpu.ops.sparse import (
    add_remaining_self_loops,
    normalize_adj_sym,
    spmm,
)

__all__ = ["GCNConv", "GraphConv", "gcn_norm", "gcn_norm_dense"]


def gcn_norm_dense(dense: DenseGraphBatch, *, add_self_loops: bool = True,
                   adj_dtype=None) -> DenseGraphBatch:
    """GCN-normalize a dense adjacency ONCE, outside the train step:
    ``D^{-1/2}(A+I)D^{-1/2}`` on valid nodes.  A static input adjacency is
    constant across steps, so pre-normalizing (and optionally down-casting
    to ``adj_dtype=jnp.bfloat16``, halving the dominant ``[B,N,N]`` HBM
    traffic) saves two full ``[B,N,N]`` passes per GCN layer per step —
    pair with ``GCNConv(normalize=False)`` / ``pre_normalized=True`` model
    flags."""
    adj = dense.adj
    if add_self_loops:
        eye = jnp.eye(adj.shape[-1], dtype=adj.dtype)
        m = dense.mask.astype(adj.dtype)
        adj = adj + eye * m[:, :, None]
    # abs degrees — same convention as the per-layer dense normalize below
    # and normalize_adj_sym, so signed edge weights can't zero a degree
    dinv = jax.lax.rsqrt(jnp.clip(jnp.abs(adj).sum(-1), 1e-12, None))
    adj = dinv[..., :, None] * adj * dinv[..., None, :]
    if adj_dtype is not None:
        adj = adj.astype(adj_dtype)
    return dense.replace(adj=adj)


def gcn_norm(batch: GraphBatch, add_self_loops: bool = True):
    """Symmetric GCN normalization ``D^{-1/2}(A+I)D^{-1/2}`` on masked COO.
    Returns ``(senders, receivers, weight)`` with the ``E+N`` static budget
    when self-loops are added.

    On a masked pooled graph (``TopkPooling(pool_mode="masked")`` —
    ``node_mask_shrunk`` set, node_mask below the edges' endpoints) edges
    whose endpoints fall outside ``node_mask`` are zeroed first, so the
    normalization covers the induced subgraph exactly.  Ordinary batches
    skip the endpoint gathers (valid edges only connect valid nodes —
    the unconditional version cost the small-batch sparse leg ~19%)."""
    s, r, w, m = (batch.senders, batch.receivers, batch.edge_weight,
                  batch.edge_mask)
    nm = batch.node_mask
    if batch.node_mask_shrunk:
        ep_valid = m & nm[s] & nm[r]
        w = jnp.where(ep_valid, w, 0.0)
        m = ep_valid
    if add_self_loops:
        s, r, w, m = add_remaining_self_loops(s, r, w, m, nm, 1.0)
    w = normalize_adj_sym(s, r, w, m, batch.num_nodes)
    return s, r, w


class GCNConv(nn.Module):
    """GCN layer: ``X' = D^{-1/2}(A+I)D^{-1/2} X W + b``.

    Accepts a sparse :class:`GraphBatch` (SpMM path) or a dense
    :class:`DenseGraphBatch` (einsum path, for pooled dense graphs).
    """

    out_channels: int
    add_self_loops: bool = True
    use_bias: bool = True
    #: dense path: set False when the input adjacency is already
    #: GCN-normalized (a static adjacency can be normalized ONCE outside the
    #: train step — saves two full [B,N,N] passes per layer per step)
    normalize: bool = True
    #: sparse path: route the SpMM through the Pallas sorted-CSR kernel
    #: (requires a batch built with ``sort_edges=True``; self-loops are
    #: applied as a separate diagonal term so the sorted layout is
    #: preserved).  ``None`` (default) applies the measured regime map
    #: (:func:`tgp_tpu.ops.sparse.use_pallas_spmm`: sorted + E ≥ 262k +
    #: TPU backend); the dense path treats ``None`` as False (XLA einsum
    #: is matmul-bound there already).
    use_pallas: Optional[bool] = None
    #: dense path: skip the output padding mask (safe when the caller never
    #: reads padding rows — e.g. top-k selection masks scores itself; saves
    #: one full [B,N,F] HBM pass per layer)
    mask_output: bool = True
    #: matmul compute dtype (params stay f32); bf16 doubles MXU throughput
    #: and halves HBM traffic on the feature path
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, batch: Union[GraphBatch, DenseGraphBatch],
                 x: Optional[jax.Array] = None) -> jax.Array:
        if x is None:
            x = batch.x
        h = nn.Dense(self.out_channels, use_bias=False, dtype=self.dtype,
                     kernel_init=nn.initializers.glorot_uniform())(x)
        from tgp_tpu.ops.sparse import use_pallas_spmm

        want_pallas = self.use_pallas
        if want_pallas is None and isinstance(batch, GraphBatch):
            want_pallas = use_pallas_spmm(batch.num_edges,
                                          batch.edges_sorted)
        if (want_pallas and isinstance(batch, GraphBatch)
                and batch.edges_sorted):
            from tgp_tpu.ops.pallas.segment_spmm import (
                segment_sum_sorted,
                spmm_csr,
            )
            from tgp_tpu.ops.sparse import weighted_degree

            N = batch.num_nodes
            interp = jax.default_backend() == "cpu"
            w = jnp.where(batch.edge_mask, batch.edge_weight, 0.0)
            if batch.row_ptr is not None and batch.senders_t is not None:
                # static-CSR fast path (round-5 profile): degree from the
                # collator (or one width-2 kernel pass under dynamic node
                # masks), both D^{-1/2} factors folded into NODE space
                # (the per-edge dinv[senders]/dinv[receivers] scalar
                # gathers alone cost 14 ms at E=1M), and the scatter-free
                # transpose backward of spmm_csr.
                w_t = batch.edge_weight_t
                if batch.in_degree is not None:
                    deg = batch.in_degree.astype(jnp.float32)
                else:
                    # masked/pooled graph: deg[r] = Σ |w_e|·m[send_e] via
                    # the kernel itself.  The table is lane-width 128:
                    # width-1 gathers hit XLA's slow scalar path (7.2 vs
                    # 1.9 ms at E=1M).  The optimization barrier keeps XLA
                    # from seeing through the broadcast and "simplifying"
                    # the row gather back into that scalar gather (it did —
                    # round-5 trace, fusion at segment_spmm.py:775).
                    nm = batch.node_mask.astype(jnp.float32)
                    tbl = jax.lax.optimization_barrier(
                        jnp.broadcast_to(nm[:, None], (N, 128)))
                    deg = spmm_csr(tbl, jnp.abs(w), jnp.abs(w_t),
                                   batch.senders, batch.receivers,
                                   batch.row_ptr, batch.receivers_t,
                                   batch.senders_t, batch.row_ptr_t,
                                   N, interp)[:, 0]
                if self.add_self_loops:
                    deg = deg + batch.node_mask.astype(deg.dtype)
                dinv = jnp.where(
                    deg > 0, jax.lax.rsqrt(jnp.maximum(deg, 1e-12)), 0.0)
                # fold node_mask into the sender-side scale: messages from
                # masked nodes (and their input gradients) are structurally
                # zero — matches the XLA path's endpoint-masked weights
                dinv = dinv * batch.node_mask.astype(dinv.dtype)
                h2 = h * dinv[:, None].astype(h.dtype)
                out = spmm_csr(h2, w, w_t, batch.senders, batch.receivers,
                               batch.row_ptr, batch.receivers_t,
                               batch.senders_t, batch.row_ptr_t, N, interp)
                out = out * dinv[:, None].astype(out.dtype)
                if self.add_self_loops:
                    out = out + h * (dinv * dinv)[:, None].astype(h.dtype)
                out = jnp.where(batch.node_mask[:, None], out, 0.0)
                if self.use_bias:
                    out = out + self.param("bias", nn.initializers.zeros,
                                           (self.out_channels,))
                return out
            deg = weighted_degree(batch.receivers, w, N)
            if self.add_self_loops:
                deg = deg + batch.node_mask.astype(deg.dtype)
            dinv = jnp.where(deg > 0, jax.lax.rsqrt(jnp.maximum(deg, 1e-12)),
                             0.0)
            w_norm = w * dinv[batch.senders] * dinv[batch.receivers]
            msgs = h[batch.senders] * w_norm[:, None]
            out = segment_sum_sorted(msgs, batch.receivers, N,
                                     interpret=interp)
            if self.add_self_loops:
                out = out + h * (dinv * dinv)[:, None]
            out = jnp.where(batch.node_mask[:, None], out, 0.0)
            if self.use_bias:
                out = out + self.param("bias", nn.initializers.zeros,
                                       (self.out_channels,))
            return out
        if isinstance(batch, DenseGraphBatch):
            adj = batch.adj
            if self.normalize:
                if self.add_self_loops:
                    eye = jnp.eye(adj.shape[-1], dtype=adj.dtype)
                    m = batch.mask.astype(adj.dtype)
                    adj = adj + eye * m[:, :, None]  # A+I on valid nodes only
                deg = jnp.clip(jnp.abs(adj).sum(-1), 1e-12, None)
                dinv = jax.lax.rsqrt(deg)
                adj = dinv[..., :, None] * adj * dinv[..., None, :]
            if self.use_pallas:
                # XLA's batched GEMM runs ~10x under roofline at these
                # shapes (see ops/pallas/bmm.py); bf16 MXU + f32 accum
                from tgp_tpu.ops.pallas.bmm import bmm_pallas

                out = bmm_pallas(adj, h,
                                 interpret=jax.default_backend() == "cpu")
            else:
                acc_dtype = jnp.float32 if self.dtype is None else h.dtype
                # keep h at its own dtype: a bf16 *adjacency* (prepare_batch
                # adj_dtype) must not silently truncate f32 features — the
                # mixed-dtype einsum promotes adj on-chip (the convert fuses
                # into the matmul read, so the bf16 HBM saving stands)
                out = jnp.einsum("bnm,bmf->bnf", adj.astype(h.dtype), h,
                                 preferred_element_type=acc_dtype)
            if self.mask_output:
                out = jnp.where(batch.mask[..., None], out, 0.0)
        else:
            s, r, w = gcn_norm(batch, self.add_self_loops)
            out = spmm(s, r, w, h, batch.num_nodes)
            out = jnp.where(batch.node_mask[:, None], out, 0.0)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
            out = out + b
        return out


class GraphConv(nn.Module):
    """``X' = W₁X + W₂·A X`` (PyG ``GraphConv``; default scorer of SAGPooling,
    reference tgp/poolers/sag.py:17-228)."""

    out_channels: int
    aggr: str = "add"

    @nn.compact
    def __call__(self, batch: GraphBatch, x: Optional[jax.Array] = None) -> jax.Array:
        if x is None:
            x = batch.x
        root = nn.Dense(self.out_channels, use_bias=True)(x)
        neigh = self._propagate(batch, x)
        if self.aggr == "mean":
            deg = spmm(batch.senders, batch.receivers, batch.edge_weight,
                       jnp.ones((batch.num_nodes, 1), x.dtype), batch.num_nodes)
            neigh = neigh / jnp.clip(deg, 1.0, None)
        neigh = nn.Dense(self.out_channels, use_bias=False)(neigh)
        out = root + neigh
        return jnp.where(batch.node_mask[:, None], out, 0.0)

    @staticmethod
    def _propagate(batch: GraphBatch, x: jax.Array) -> jax.Array:
        """``A X`` — the static-CSR fast path (scatter-free backward) in the
        same regime GCNConv uses it; XLA segment-sum otherwise."""
        import jax as _jax

        from tgp_tpu.ops.sparse import use_pallas_spmm

        w = jnp.where(batch.edge_mask, batch.edge_weight, 0.0)
        if (batch.row_ptr is not None and batch.senders_t is not None
                and use_pallas_spmm(batch.num_edges, batch.edges_sorted)):
            from tgp_tpu.ops.pallas.segment_spmm import spmm_csr

            # endpoint-mask the sender side when the mask may exclude live
            # edges (masked pooled graphs) — gradients stay exact because
            # the mask folds into the node-space scale, not the indices
            nm = batch.node_mask.astype(x.dtype)
            return spmm_csr(
                x * nm[:, None], w, batch.edge_weight_t,
                batch.senders, batch.receivers, batch.row_ptr,
                batch.receivers_t, batch.senders_t, batch.row_ptr_t,
                batch.num_nodes,
                _jax.default_backend() == "cpu")
        if batch.node_mask_shrunk:
            w = w * (batch.node_mask[batch.senders]
                     & batch.node_mask[batch.receivers])
        return spmm(batch.senders, batch.receivers, w, x, batch.num_nodes,
                    indices_are_sorted=batch.edges_sorted)
