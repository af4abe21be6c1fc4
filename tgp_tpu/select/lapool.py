"""LaPool selection (reference: tgp/select/lapool_select.py:81-426; Noutahi
et al. 2019).

Leaders = strict local maxima of the Laplacian-smoothness signal
``v = ‖(LX)_i‖₂``; follower nodes are soft-assigned to their graph's leaders
by cosine similarity with a masked softmax (the reference's sparse softmax
over the dense ``[N, num_leaders]`` cosine matrix,
lapool_select.py:26-78).  TPU layout: leaders take per-graph slots
``[0, Kmax)`` (``Kmax = max_nodes`` worst case), giving an unbatched-dense
``S [N, Kmax]`` with invalid slots masked.

The optional shortest-path β regularization (scipy ``csgraph`` on CPU in
the reference) is not implemented on-device; ``shortest_path_reg`` must stay
False under jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from tgp_tpu.graph import GraphBatch
from tgp_tpu.ops.segment import segment_max, segment_topk_rank
from tgp_tpu.ops.sparse import spmm, weighted_degree
from tgp_tpu.select.base import SelectOutput

__all__ = ["lapool_select", "shortest_path_weights"]


def _safe_norm(x, eps: float = 1e-24):
    """L2 norm over the last axis (kept dim) with finite gradients at 0 —
    ``jnp.linalg.norm`` backpropagates 0/0 = NaN for all-zero rows (padded
    nodes, invalid leader slots)."""
    return jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True) + eps)


def lapool_select(batch: GraphBatch, *, shortest_path_reg: bool = False,
                  sp_weight=None, s_inv_op: str = "transpose"
                  ) -> SelectOutput:
    """``sp_weight [N, Kmax]`` (optional) multiplies the cosine scores before
    the softmax — the shortest-path β regularization, computed host-side by
    :func:`shortest_path_weights` (the reference also runs it on CPU via
    scipy ``csgraph``, lapool_select.py:​81-426)."""
    if shortest_path_reg and sp_weight is None:
        raise NotImplementedError(
            "shortest_path_reg needs host-computed sp_weight "
            "(see shortest_path_weights); it cannot run under jit")
    N = batch.num_nodes
    B = batch.num_graphs
    Kmax = batch.max_nodes
    x = batch.x
    s, r, w, em = (batch.senders, batch.receivers, batch.edge_weight,
                   batch.edge_mask)

    # v = ‖(L X)_i‖₂,  LX = D X − A X
    deg = weighted_degree(s, jnp.where(em, w, 0.0), N)
    ax = spmm(r, s, jnp.where(em, w, 0.0), x, N)  # (A X)_i over senders
    lx = deg[:, None] * x - ax
    v = _safe_norm(lx)[..., 0]

    # local maximum over incident edges — NON-strict ``>=`` like the
    # reference (lapool_select.py:_forward_batched ``v_norm >= neighbor_max``)
    # so the per-graph argmax is always a leader and adjacent ties both lead
    # (undirected graphs list both directions, so in-neighbors suffice)
    neigh_max = segment_max(v[s], r, N, mask=em)
    neigh_max = jnp.where(jnp.isfinite(neigh_max), neigh_max, -jnp.inf)
    leader = batch.node_mask & (v >= neigh_max)

    # leader slots: rank among leaders of the same graph
    slot = segment_topk_rank(-jnp.arange(N, dtype=jnp.float32),
                             batch.node_graph, B, mask=leader)
    slot = jnp.minimum(slot, Kmax - 1)

    # gather leader features into [B, Kmax, F]
    F = x.shape[-1]
    x_lead = jnp.zeros((B, Kmax, F), x.dtype).at[
        batch.node_graph, slot].add(jnp.where(leader[:, None], x, 0.0))
    slot_valid = jnp.zeros((B, Kmax), bool).at[
        batch.node_graph, slot].max(leader)

    # cosine similarity to own graph's leaders (safe norms: padded rows and
    # invalid leader slots are all-zero, and d‖x‖/dx at 0 is 0/0 = NaN even
    # when the forward value is clipped away)
    xn = x / _safe_norm(x)
    ln = x_lead / _safe_norm(x_lead)
    cos = jnp.einsum("nf,nkf->nk", xn, ln[batch.node_graph])  # [N, Kmax]
    valid_cols = slot_valid[batch.node_graph]
    # NaN-safe masked softmax: a row whose graph has zero leaders (e.g. an
    # empty padded graph) must yield all-zero weights with defined gradients
    # — softmax over an all-(-inf) row is NaN and poisons the backward pass
    # even when the forward value is re-masked afterwards
    logits = jnp.where(valid_cols, cos, jnp.finfo(x.dtype).min)
    logits = logits - jax.lax.stop_gradient(
        jnp.max(logits, axis=-1, keepdims=True))
    e = jnp.where(valid_cols, jnp.exp(logits), 0.0)
    soft = e / jnp.clip(jnp.sum(e, axis=-1, keepdims=True), 1e-20, None)
    if sp_weight is not None:
        # β multiplies the softmax output (reference: ``s = beta * s``,
        # lapool_select.py:_forward_batched), NOT the logits
        soft = soft * sp_weight

    # leaders one-hot to their own slot; followers get the softmax
    onehot = jax.nn.one_hot(slot, Kmax, dtype=x.dtype) * leader[:, None]
    S = jnp.where(leader[:, None], onehot, soft)
    S = jnp.where(batch.node_mask[:, None], S, 0.0)

    return SelectOutput(
        s=S,
        node_graph=batch.node_graph,
        node_mask=batch.node_mask,
        num_clusters=Kmax,
        num_graphs=B,
        max_clusters=Kmax,
        s_inv_op=s_inv_op,
        extras={"leader": leader, "v": v, "slot": slot},
    )


def shortest_path_weights(batch: GraphBatch, leader, slot) -> "jax.Array":
    """Host-side β = 1/shortest-path-distance weights ``[N, Kmax]``
    (scipy ``csgraph``, like the reference's CPU path).  ``leader``/``slot``
    come from a first (unregularized) :func:`lapool_select` pass."""
    import numpy as np
    import scipy.sparse as sp
    import scipy.sparse.csgraph as csgraph

    N, Kmax = batch.num_nodes, batch.max_nodes
    s = np.asarray(batch.senders)
    r = np.asarray(batch.receivers)
    em = np.asarray(batch.edge_mask)
    A = sp.csr_matrix((np.ones(em.sum()), (s[em], r[em])), shape=(N, N))
    leader = np.asarray(leader)
    slot_np = np.asarray(slot)
    ng = np.asarray(batch.node_graph)
    idx = np.nonzero(leader)[0]
    out = np.zeros((N, Kmax), np.float32)
    if idx.size:
        d = csgraph.shortest_path(A, method="D", unweighted=True,
                                  indices=idx)
        for row, i in enumerate(idx):
            dist = d[row]
            # reference β (lapool_select.py): 1/dist for reachable non-self
            # nodes, 0 for self (irrelevant — leaders are overwritten by
            # their one-hot) and 0 for unreachable (1/inf)
            finite_pos = np.isfinite(dist) & (dist > 0)
            safe = np.where(finite_pos, dist, 1.0)
            w = np.where(finite_pos, 1.0 / safe, 0.0)
            same = ng == ng[i]
            out[same, slot_np[i]] = w[same]
    return jnp.asarray(out)
