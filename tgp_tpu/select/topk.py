"""Top-k selection (reference: ``TopkSelect``, tgp/select/topk_select.py:14-216).

TPU design: instead of PyG's dynamic per-graph ``topk`` (sorting and
*compacting* to a shorter node list), scores are ranked **within each graph**
by :func:`~tgp_tpu.ops.segment.segment_topk_rank` and a node is selected iff
``rank < ceil(ratio · n_g)``.  Selected node *i* becomes supernode
``g_i · Kmax + rank_i`` in a graph-major static id space of
``B · Kmax`` slots (``Kmax = ceil(ratio · max_nodes)``), with validity masks
instead of compaction.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from tgp_tpu.graph import DenseGraphBatch, GraphBatch
from tgp_tpu.ops.segment import segment_softmax, segment_topk_rank
from tgp_tpu.select.base import SelectOutput
from tgp_tpu.utils.activations import resolve_activation


def topk_budget(ratio: Union[int, float], max_nodes: int) -> int:
    """Static per-graph supernode budget ``Kmax``."""
    if isinstance(ratio, int) and ratio >= 1:
        return min(ratio, max_nodes)
    return max(int(math.ceil(ratio * max_nodes)), 1)


@jax.custom_vjp
def _topk_values_vjp(ranked, idx, top_scores):
    """``top_scores`` (= ``ranked`` gathered at ``idx``) with a
    scatter-free VJP: forward is FREE (``lax.top_k`` already produced the
    values), backward routes the cotangent through a one-hot contraction
    — ``lax.top_k``'s own VJP is an XLA scatter that serializes on TPU
    (72 µs of the 174 µs round-4 flagship step), and materializing the
    one-hot in the FORWARD too costs another ~9 µs of HBM
    (scripts/exp_r5_step_trace.py)."""
    del ranked, idx
    return top_scores


def _tv_fwd(ranked, idx, top_scores):
    return top_scores, (idx, ranked.shape[1])


def _tv_bwd(res, g):
    idx, n = res
    # 0/1 one-hot: exact contraction under HIGHEST; the bool→f32 convert
    # fuses into the matmul read
    onehot = (idx[:, :, None]
              == jnp.arange(n, dtype=idx.dtype)[None, None, :])
    d_ranked = jnp.einsum("bk,bkn->bn", g.astype(jnp.float32),
                          onehot.astype(jnp.float32),
                          precision=jax.lax.Precision.HIGHEST
                          ).astype(g.dtype)
    # the top_scores operand is an already-stop-gradded value channel —
    # its cotangent is zero by construction
    return d_ranked, None, jnp.zeros_like(g)


_topk_values_vjp.defvjp(_tv_fwd, _tv_bwd)


def topk_select_from_scores(
    score: jax.Array,
    batch: GraphBatch,
    ratio: Union[int, float],
    min_score: Optional[float] = None,
    s_inv_op: str = "transpose",
    extras: Optional[dict] = None,
) -> SelectOutput:
    """Shared selection core: per-graph ranking of a precomputed score.

    Used by Topk/SAG/ASAP/PAN/MaxCut poolers (they differ only in how the
    score is produced; cf. reference topk_select.py:169-207 and PyG ``topk``).
    """
    B = batch.num_graphs
    kmax = batch.max_nodes if min_score is not None else topk_budget(
        ratio, batch.max_nodes
    )
    rank = segment_topk_rank(score, batch.node_graph, B, mask=batch.node_mask)

    if min_score is not None:
        # PyG ``topk`` semantics: threshold at min(max_g − tol, min_score) so
        # at least the top-scoring node of each graph survives
        # (reference: torch_geometric.nn.pool.select.topk, used by
        # tgp/select/topk_select.py:169-207).
        from tgp_tpu.ops.segment import segment_max

        smax = segment_max(score, batch.node_graph, B, mask=batch.node_mask)
        thr = jnp.minimum(smax - 1e-7, min_score)
        keep = batch.node_mask & (score > thr[batch.node_graph])
        # rank among *kept* nodes gives a compact per-graph slot
        rank = segment_topk_rank(score, batch.node_graph, B, mask=keep)
    else:
        n_g = batch.nodes_per_graph()
        if isinstance(ratio, int) and ratio >= 1:
            k_g = jnp.minimum(n_g, ratio)
        else:
            k_g = jnp.ceil(ratio * n_g).astype(jnp.int32)
            k_g = jnp.maximum(k_g, 1)
        keep = batch.node_mask & (rank < k_g[batch.node_graph])

    num_clusters = B * kmax
    rank_c = jnp.minimum(rank, kmax - 1)
    cluster_index = jnp.where(keep, batch.node_graph * kmax + rank_c, 0)

    cluster_graph = (
        jnp.arange(num_clusters, dtype=jnp.int32) // kmax
    )
    cluster_pos = (jnp.arange(num_clusters, dtype=jnp.int32) % kmax)

    return SelectOutput(
        cluster_index=cluster_index.astype(jnp.int32),
        weight=jnp.where(keep, score, 0.0),
        node_sel_mask=keep,
        node_graph=batch.node_graph,
        node_mask=batch.node_mask,
        cluster_graph=cluster_graph,
        cluster_pos=cluster_pos,
        num_clusters=num_clusters,
        num_graphs=B,
        max_clusters=kmax,
        partial=True,
        s_inv_op=s_inv_op,
        extras=extras or {},
    )


def dense_topk_indices(
    score: jax.Array,
    mask: jax.Array,
    ratio: Union[int, float],
    min_score: Optional[float] = None,
):
    """Dense-world top-k ranking: per-graph ``jax.lax.top_k`` over the
    padded score matrix (the scatter-free twin of
    :func:`topk_select_from_scores`; reference semantics:
    tgp/select/topk_select.py:169-207 and PyG ``topk``).

    Args:
      score: ``[B, N]`` activated scores (already per-graph-softmaxed when
        ``min_score`` is used).
      mask: ``[B, N]`` node validity.
      ratio: fraction (or absolute int count) of nodes kept per graph.
      min_score: PyG threshold semantics — keep nodes with
        ``score > min(max_g − 1e-7, min_score)`` (so at least the top node
        of each graph survives); the slot budget becomes ``N``.

    Returns:
      ``(idx [B,K], slot_mask [B,K], gate [B,K])`` — kept-node indices
      (score-descending), slot validity, and the score gate (0 on invalid
      slots).  ``top_k`` is descending, so valid slots are a prefix.
    """
    B, N = score.shape
    neg = jnp.finfo(score.dtype).min
    ranked = jnp.where(mask, score, neg)
    K = N if min_score is not None else topk_budget(ratio, N)
    top_scores, idx = jax.lax.top_k(ranked, K)
    # top_scores feeds only boolean masks below; the differentiable gate
    # flows through _topk_values_vjp instead, because lax.top_k's VJP is a
    # [B,K]→[B,N] XLA scatter that serializes on TPU — profiled at 72 µs
    # of the 174 µs flagship step (41%, scripts/exp_r5_step_trace.py)
    # vs ~1 µs for the MXU einsum transpose.
    top_scores = jax.lax.stop_gradient(top_scores)

    if min_score is not None:
        smax = top_scores[:, :1]
        thr = jnp.minimum(smax - 1e-7, min_score)
        slot_mask = top_scores > thr
    else:
        n_g = mask.sum(-1)
        if isinstance(ratio, int) and ratio >= 1:
            k_g = jnp.minimum(n_g, ratio).astype(jnp.int32)
        else:
            k_g = jnp.maximum(jnp.ceil(ratio * n_g), 1).astype(jnp.int32)
        slot_mask = jnp.arange(K)[None, :] < k_g[:, None]
    slot_mask = slot_mask & (top_scores > neg)  # empty graphs stay empty
    # differentiable gate: forward reuses top_k's values verbatim (free);
    # only the BACKWARD builds the one-hot contraction
    ts_diff = _topk_values_vjp(ranked, idx, top_scores)
    gate = jnp.where(slot_mask, ts_diff, 0.0)
    return idx, slot_mask, gate


def dense_topk_select_output(
    score: jax.Array,
    mask: jax.Array,
    ratio: Union[int, float],
    min_score: Optional[float] = None,
    s_inv_op: str = "transpose",
) -> SelectOutput:
    """Build the dense-layout :class:`SelectOutput` for a top-k selection:
    ``s[b, n, k] = gate[b, k] · 1[idx[b, k] = n]`` — the gated selection
    one-hot (the reference's ``S = diag(score)`` restricted to kept columns,
    tgp/select/topk_select.py:199-207), so the generic dense reduce/lift
    paths work unchanged.  The raw ``idx/slot_mask/gate`` ride along in
    ``extras`` for the scatter-free fast pooling path
    (:func:`tgp_tpu.poolers.topk.dense_topk_apply`); XLA dead-code-eliminates
    ``s`` when only the fast path consumes the output."""
    B, N = score.shape
    idx, slot_mask, gate = dense_topk_indices(score, mask, ratio, min_score)
    K = idx.shape[1]
    P = idx[:, :, None] == jnp.arange(N, dtype=idx.dtype)[None, None, :]
    s = jnp.swapaxes(P.astype(score.dtype) * gate[:, :, None], -1, -2)
    return SelectOutput(
        s=s,
        in_mask=mask,
        cluster_mask=slot_mask,
        extras={"idx": idx, "slot_mask": slot_mask, "gate": gate},
        num_clusters=B * K,
        num_graphs=B,
        max_clusters=K,
        partial=True,
        s_inv_op=s_inv_op,
    )


class TopkSelect(nn.Module):
    """Learnable-projection top-k selector.

    ``y = act(X·p/‖p‖)`` (or per-graph softmax when ``min_score`` is set),
    then per-graph top-``ratio`` selection (reference:
    tgp/select/topk_select.py:169-207).
    """

    in_channels: Optional[int] = None
    ratio: Union[int, float] = 0.5
    min_score: Optional[float] = None
    act: Union[str, Callable, None] = "tanh"
    s_inv_op: str = "transpose"

    def setup(self):
        if self.in_channels is not None and self.in_channels > 1:
            bound = 1.0 / math.sqrt(self.in_channels)
            # uniform(-bound, bound), matching PyG's ``uniform`` init
            self.weight = self.param(
                "weight",
                lambda key, shape: jax.random.uniform(
                    key, shape, minval=-bound, maxval=bound
                ),
                (self.in_channels,),
            )

    def raw_scores(self, x: jax.Array, dense: bool = False) -> jax.Array:
        """Row-wise pre-activation projection ``X·p/‖p‖`` — addressable via
        ``pooler.apply(..., method=...)`` so the node-sharded path
        (tgp_tpu/parallel/sparse_pool.py) scores each shard with the SAME
        parameters as the single-device forward (VERDICT r4 #2)."""
        if self.in_channels is None or self.in_channels <= 1:
            return x[..., 0] if x.ndim > (2 if dense else 1) else x
        w = self.weight
        score = x.astype(w.dtype) @ w
        if self.min_score is None:
            score = score / jnp.maximum(jnp.linalg.norm(w), 1e-12)
        return score

    def __call__(self, batch: Union[GraphBatch, DenseGraphBatch]
                 ) -> SelectOutput:
        dense = isinstance(batch, DenseGraphBatch)
        score = self.raw_scores(batch.x, dense)

        if dense:
            # dense-world twin: [B, N] scores, row-wise masked softmax for
            # the min_score path, jax.lax.top_k ranking
            if self.min_score is None:
                score = resolve_activation(self.act)(score)
            else:
                neg = jnp.finfo(score.dtype).min
                score = jax.nn.softmax(
                    jnp.where(batch.mask, score, neg), axis=-1)
            return dense_topk_select_output(
                score, batch.mask, self.ratio, self.min_score, self.s_inv_op
            )

        if self.min_score is None:
            score = resolve_activation(self.act)(score)
        else:
            score = segment_softmax(
                score, batch.node_graph, batch.num_graphs, mask=batch.node_mask
            )

        return topk_select_from_scores(
            score, batch, self.ratio, self.min_score, self.s_inv_op
        )
