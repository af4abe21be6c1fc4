"""Sparse connectivity ops under static shapes: coalesce, degree, self-loops,
adjacency post-processing, SpMM.

These are the TPU-native replacements for the reference's connectivity "ABI"
(`tgp/utils/ops.py`): instead of dynamic-shape ``coalesce``/``subgraph``
compaction, everything here keeps the static edge budget and uses validity
masks — duplicate edges are merged by sort + segment-sum with surplus slots
masked out (SURVEY §7 design translation table).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tgp_tpu.ops.segment import (
    segment_max,
    segment_normalize,
    segment_sum,
)

__all__ = [
    "check_and_filter_edge_weights",
    "coalesce",
    "weighted_degree",
    "remove_self_loops",
    "add_remaining_self_loops",
    "spmm",
    "spmm_batch",
    "sddmm",
    "normalize_adj_sym",
    "postprocess_adj_sparse",
    "postprocess_adj_dense",
    "rank3_trace",
    "rank3_diag",
]


#: auto-dispatch threshold shared by the dense combinatorial engines
#: (edge-contraction matching, KMIS, maxcut assignment voting): run the
#: per-graph dense ``[B,Nmax,Nmax]`` loop when the matrix stays under 16M
#: elements (64 MB int32/f32)
DENSE_VOTE_BUDGET = 2 ** 24


def use_dense_vote(num_graphs: int, max_nodes: int) -> bool:
    """Regime test for the dense combinatorial engines (matching / MIS /
    assignment voting): ``B·Nmax²`` must fit :data:`DENSE_VOTE_BUDGET`.
    Static metadata only — decidable at trace time."""
    return num_graphs * max_nodes ** 2 <= DENSE_VOTE_BUDGET


def check_and_filter_edge_weights(edge_weight):
    """Normalize edge weights to flat ``[E]`` shape.

    The reference accepts both ``[E]`` and ``[E, 1]`` column weights at every
    entry point (``tgp/utils/ops.py:1043-1058``); this is the same contract.
    A ``[E, 1]`` array is flattened; any other multi-dim shape raises.  The
    check is on static shape only, so it is free under ``jit``.
    """
    if edge_weight is not None and edge_weight.ndim > 1:
        if edge_weight.ndim == 2 and edge_weight.shape[-1] == 1:
            edge_weight = jnp.reshape(edge_weight, (-1,))
        else:
            raise ValueError(
                "Edge weights must be of shape [E] or [E, 1], but got "
                f"{edge_weight.shape}.")
    return edge_weight


def coalesce(senders, receivers, edge_weight, edge_mask, num_nodes: int,
             reduce: str = "sum"):
    """Merge duplicate ``(sender, receiver)`` edges with a static edge budget.

    Replaces PyG's dynamic ``coalesce`` (used by sparse connect on total
    assignments, tgp/connect/base_conn.py:57-112).  Sorts edges by the scalar
    key ``sender * num_nodes + receiver`` (invalid edges to the back), sums
    (or max/mean-reduces) weights of equal keys into the *first* slot of each
    duplicate run, and masks the rest.  Output edge count == input edge count;
    surplus slots have ``edge_mask=False`` and weight 0.
    """
    E = senders.shape[0]
    # Push invalid edges to the back; lexsort avoids key overflow on large N.
    s_k = jnp.where(edge_mask, senders, num_nodes)
    r_k = jnp.where(edge_mask, receivers, num_nodes)
    order = jnp.lexsort((r_k, s_k))
    ss, rs = s_k[order], r_k[order]
    sw = jnp.where(edge_mask, edge_weight, 0.0)[order]

    # Head of each run of equal (sender, receiver) keys.
    is_head = jnp.concatenate(
        [jnp.ones(1, bool), (ss[1:] != ss[:-1]) | (rs[1:] != rs[:-1])]
    )
    # Run id per sorted position = inclusive-scan of heads - 1.
    run_id = jnp.cumsum(is_head.astype(jnp.int32)) - 1
    if reduce == "sum":
        run_val = segment_sum(sw, run_id, E)
    elif reduce == "mean":
        run_sum = segment_sum(sw, run_id, E)
        run_cnt = segment_sum(jnp.ones_like(sw), run_id, E)
        run_val = run_sum / jnp.maximum(run_cnt, 1.0)
    elif reduce == "max":
        run_val = segment_max(sw, run_id, E)
    else:
        raise ValueError(f"unknown reduce {reduce!r}")

    valid = is_head & (ss < num_nodes)
    w_out = jnp.where(valid, run_val[run_id], 0.0)
    s_out = jnp.where(valid, senders[order], 0)
    r_out = jnp.where(valid, receivers[order], 0)
    return s_out, r_out, w_out, valid


def weighted_degree(index, weight, num_nodes: int, mask=None):
    """Per-node (weighted) degree (reference: tgp/utils/ops.py:975-997)."""
    if weight is None:
        weight = jnp.ones(index.shape[0], jnp.float32)
    return segment_sum(weight, index, num_nodes, mask=mask)


def remove_self_loops(senders, receivers, edge_weight, edge_mask):
    """Mask out self-loop edges (static shape; no compaction)."""
    keep = edge_mask & (senders != receivers)
    return senders, receivers, jnp.where(keep, edge_weight, 0.0), keep


def add_remaining_self_loops(senders, receivers, edge_weight, edge_mask,
                             node_mask, fill_value: float = 1.0):
    """Append one self-loop slot per node; existing self-loops keep their
    weight, missing ones get ``fill_value``.

    Static-shape version of tgp/utils/ops.py:1000-1040: output edge budget is
    ``E + N``.  The appended slot for node *i* is masked out when the input
    already contains a valid ``(i, i)`` edge.
    """
    N = node_mask.shape[0]
    has_loop = segment_sum(
        (edge_mask & (senders == receivers)).astype(jnp.int32), senders, N
    ) > 0
    loop_idx = jnp.arange(N, dtype=senders.dtype)
    new_mask = node_mask & ~has_loop
    s = jnp.concatenate([senders, loop_idx])
    r = jnp.concatenate([receivers, loop_idx])
    w = jnp.concatenate([
        edge_weight,
        jnp.where(new_mask, fill_value, 0.0).astype(edge_weight.dtype),
    ])
    m = jnp.concatenate([edge_mask, new_mask])
    return s, r, w, m


#: regime boundary (RESULTS.md round-2/3 measurements, TPU v5e): the Pallas
#: sorted-CSR kernel beats XLA's sorted scatter from ~262k edges up (2.7x at
#: E=1M); below, XLA's scatter is cheaper than the kernel's grid overhead.
PALLAS_MIN_EDGES = 1 << 18


def use_pallas_spmm(num_edges: int, edges_sorted: bool) -> bool:
    """The measured regime map, as code (VERDICT r2 #3): route the SpMM
    through the Pallas sorted-CSR kernel iff the edges are receiver-sorted,
    large enough (:data:`PALLAS_MIN_EDGES`), and a TPU is the backend
    (interpret-mode Pallas on CPU is orders slower than XLA scatter)."""
    import jax.extend.backend as _backend

    return (edges_sorted and num_edges >= PALLAS_MIN_EDGES
            and _backend.get_backend().platform not in ("cpu",))


#: model-level crossover (RESULTS.md round-2/3): at B=64·N=256 the dense
#: scatter-free pipeline runs ~90× faster than the sparse one (one XLA
#: scatter SpMM ≈ 1.3 ms vs ~free dense bmm); the B·N² terms overtake the
#: sparse path around Nmax ≈ 2k (models/fast_dense.py docstring).
DENSE_PIPELINE_MAX_NODES = 2048
#: cap on the densified adjacency's size — past this the [B,N,N] tensor
#: alone threatens the HBM budget and the sparse path wins on memory
DENSE_PIPELINE_MAX_ADJ_BYTES = 2 << 30


def use_dense_pipeline(num_graphs: int, max_nodes: int,
                       itemsize: int = 4) -> bool:
    """Model-level regime map (VERDICT r3 #2b): route a batch of small
    graphs through the dense scatter-free pipeline iff the per-graph width
    is under the measured crossover and the ``[B, Nmax, Nmax]`` adjacency
    fits the byte budget.  All inputs are static batch metadata, so this is
    decidable at trace time (or on the host, once per batch)."""
    return (max_nodes <= DENSE_PIPELINE_MAX_NODES
            and num_graphs * max_nodes * max_nodes * itemsize
            <= DENSE_PIPELINE_MAX_ADJ_BYTES)


def spmm(senders, receivers, edge_weight, x, num_nodes: int, *,
         indices_are_sorted: bool = False, method: str = "auto"):
    """Sparse matmul ``(A X)[r] = Σ_{e: recv[e]=r} w_e · x[send_e]``.

    The gather + segment-sum formulation of SpMM — the single hottest sparse
    primitive (reference analogue: ``torch.sparse.mm`` / torch_scatter
    scatter in message passing and reduce; SURVEY §7).  Padding edges carry
    zero weight, so no masking is needed.  Pass ``indices_are_sorted=True``
    when ``receivers`` is ascending (e.g. after :func:`sort_by_receiver`) to
    skip XLA's serialized random-scatter path.

    ``method``: ``"auto"`` applies the measured regime map
    (:func:`use_pallas_spmm`); ``"xla"`` / ``"pallas"`` force a path.
    """
    if method == "auto":
        method = ("pallas" if use_pallas_spmm(
            senders.shape[0], indices_are_sorted) else "xla")
    edge_weight = check_and_filter_edge_weights(edge_weight)
    msgs = x[senders] * edge_weight[:, None]
    if method == "pallas":
        # the sorted-CSR kernel assumes ascending receivers — on unsorted
        # input it would return silently wrong sums (ADVICE r3)
        if not indices_are_sorted:
            raise ValueError(
                "spmm(method='pallas') requires indices_are_sorted=True "
                "(receiver-ascending edges; see sort_by_receiver)")
        import jax.extend.backend as _backend

        from tgp_tpu.ops.pallas.segment_spmm import segment_sum_sorted

        # interpret-mode keeps the forced path runnable off-TPU (tests)
        interp = _backend.get_backend().platform == "cpu"
        return segment_sum_sorted(msgs, receivers, num_nodes,
                                  interpret=interp)
    return jax.ops.segment_sum(msgs, receivers, num_segments=num_nodes,
                               indices_are_sorted=indices_are_sorted)


def spmm_batch(batch, x=None, *, abs_weights: bool = False):
    """``A X`` over a :class:`~tgp_tpu.graph.GraphBatch`, on the fastest
    available path — the building block for custom message-passing layers.

    Dispatch (what GCNConv/GraphConv use internally, round-5 regime map):

    * collator CSR metadata present + Pallas regime → :func:`spmm_csr`
      (weight-fused sorted kernel, scatter-free transpose backward);
    * receiver-sorted edges → XLA segment-sum with the sorted flag;
    * otherwise → XLA scatter segment-sum.

    Masked pooled graphs (``node_mask_shrunk``) are handled by folding the
    node mask into the sender side, so the product covers exactly the
    induced subgraph.  ``abs_weights`` aggregates with ``|w|`` (degree-style
    sums)."""
    import jax.extend.backend as _backend

    if x is None:
        x = batch.x
    w = jnp.where(batch.edge_mask, batch.edge_weight, 0.0)
    w_t = batch.edge_weight_t
    if abs_weights:
        w = jnp.abs(w)
        w_t = None if w_t is None else jnp.abs(w_t)
    nm = batch.node_mask
    if (batch.row_ptr is not None and batch.senders_t is not None
            and use_pallas_spmm(batch.num_edges, batch.edges_sorted)):
        from tgp_tpu.ops.pallas.segment_spmm import spmm_csr

        x_in = x * nm[:, None].astype(x.dtype) if batch.node_mask_shrunk \
            else x
        return spmm_csr(x_in, w, w_t, batch.senders, batch.receivers,
                        batch.row_ptr, batch.receivers_t, batch.senders_t,
                        batch.row_ptr_t, batch.num_nodes,
                        _backend.get_backend().platform == "cpu")
    if batch.node_mask_shrunk:
        w = w * (nm[batch.senders] & nm[batch.receivers])
    return spmm(batch.senders, batch.receivers, w, x, batch.num_nodes,
                indices_are_sorted=batch.edges_sorted)


def sort_by_receiver(senders, receivers, edge_weight, edge_mask=None):
    """Reorder a masked COO by ascending receiver so repeated ``spmm`` /
    segment ops over it can use ``indices_are_sorted=True`` (sorted scatters
    measured ~7× faster than random on TPU for 1-d updates,
    scripts/exp_sorted_segment.py).  Pays one argsort — worth it whenever
    the same adjacency drives ≥2 propagation rounds."""
    perm = jnp.argsort(receivers)
    out = (senders[perm], receivers[perm], edge_weight[perm])
    if edge_mask is not None:
        out = out + (edge_mask[perm],)
    return out


def sddmm(senders, receivers, a, b):
    """Sampled dense-dense matmul: per-edge ``⟨a[s], b[r]⟩`` (the edge-wise
    ``⟨S_i, S_j⟩`` primitive of the sparse loss twins, e.g.
    ``sparse_mincut_loss``, tgp/utils/losses.py:126-215)."""
    return jnp.sum(a[senders] * b[receivers], axis=-1)


def normalize_adj_sym(senders, receivers, edge_weight, edge_mask,
                      num_nodes: int, eps: float = 1e-12):
    """Symmetric degree normalization ``D^{-1/2} A D^{-1/2}`` on masked COO."""
    deg = weighted_degree(receivers, jnp.abs(edge_weight), num_nodes,
                          mask=edge_mask)
    dinv = jnp.where(deg > eps, jax.lax.rsqrt(jnp.maximum(deg, eps)), 0.0)
    w = edge_weight * dinv[senders] * dinv[receivers]
    return jnp.where(edge_mask, w, 0.0)


def postprocess_adj_sparse(senders, receivers, edge_weight, edge_mask,
                           node_graph, num_nodes: int, num_graphs: int, *,
                           remove_self_loops_flag: bool = True,
                           degree_norm: bool = False,
                           edge_weight_norm: bool = False,
                           prune_eps: float | None = None):
    """Pooled-adjacency post-processing, sparse world
    (reference: ``postprocess_adj_pool_sparse``, tgp/utils/ops.py:338-419):
    optional self-loop removal, ε-pruning of tiny weights, symmetric degree
    norm, and per-graph max-abs edge-weight normalization."""
    w, m = edge_weight, edge_mask
    if remove_self_loops_flag:
        senders, receivers, w, m = remove_self_loops(senders, receivers, w, m)
    if prune_eps is not None:
        keep = m & (jnp.abs(w) > prune_eps)
        w = jnp.where(keep, w, 0.0)
        m = keep
    if degree_norm:
        # Reference-exact (tgp/utils/ops.py:385-404): sender-side plain
        # weighted degree, clamped at eps.
        deg = weighted_degree(senders, w, num_nodes, mask=m)
        dinv = jax.lax.rsqrt(jnp.clip(deg, 1e-8, None))
        w = w * dinv[senders] * dinv[receivers]
        w = jnp.where(m, w, 0.0)
    if edge_weight_norm:
        edge_graph = node_graph[senders]
        w = segment_normalize(w, edge_graph, num_graphs, mask=m, ord="max_abs")
        w = jnp.where(m, w, 0.0)
    return senders, receivers, w, m


def rank3_trace(x):
    """Batched trace of ``[B, N, N]`` (reference: tgp/utils/ops.py:28-38)."""
    return jnp.einsum("bii->b", x)


def rank3_diag(x):
    """``[B, N]`` → batched diagonal matrices ``[B, N, N]``
    (reference: tgp/utils/ops.py:41-50)."""
    return x[..., None] * jnp.eye(x.shape[-1], dtype=x.dtype)


def postprocess_adj_dense(adj, mask=None, *,
                          remove_self_loops_flag: bool = True,
                          degree_norm: bool = False,
                          edge_weight_norm: bool = False,
                          adj_transpose: bool = False,
                          eps: float = 1e-8):
    """Pooled-adjacency post-processing, dense world ``[B, K, K]``
    (reference: ``postprocess_adj_pool_dense``, tgp/utils/ops.py:282-335):
    zero the diagonal, optional ``D^{-1/2} A D^{-1/2}`` (transpose-aware),
    optional per-graph max-abs normalization."""
    B, K, _ = adj.shape
    if remove_self_loops_flag:
        adj = adj * (1.0 - jnp.eye(K, dtype=adj.dtype))
    if degree_norm:
        # Reference-exact (tgp/utils/ops.py:310-320): d = plain row sums
        # (column sums when transposed) clamped at eps — NOT |w| sums, and no
        # zeroing of low-degree rows.
        a = jnp.swapaxes(adj, -1, -2) if adj_transpose else adj
        dinv = jax.lax.rsqrt(jnp.clip(a.sum(-1), eps, None))
        a = dinv[..., :, None] * a * dinv[..., None, :]
        adj = jnp.swapaxes(a, -1, -2) if adj_transpose else a
    if edge_weight_norm:
        mx = jnp.max(jnp.abs(adj).reshape(B, -1), axis=-1)
        mx = jnp.where(mx > eps, mx, 1.0)
        adj = adj / mx[:, None, None]
    if mask is not None:
        m = mask.astype(adj.dtype)
        adj = adj * m[:, :, None] * m[:, None, :]
    return adj
