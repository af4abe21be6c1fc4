"""Static-shape graph batch containers — the TPU-native data substrate.

The reference library (torch-geometric-pool) carries graphs as dynamic-shape
``x:[N,F]`` / ``edge_index:[2,E]`` / ``batch:[N]`` triples (PyG disjoint-union
batching) and a parallel dense world ``x:[B,Nmax,F]`` / ``adj:[B,Nmax,Nmax]`` /
``mask:[B,Nmax]`` (reference: tgp/src.py:374-452).  On TPU everything under
``jit`` must have static shapes, so this module defines the two equivalents:

* :class:`GraphBatch` — the **sparse world**: packed COO with *trailing
  padding* and explicit validity masks.  Nodes of all graphs are packed into a
  flat ``[N]`` axis (real nodes first, padding last), edges into ``[E]``.
  Padding never has to be branched on: padded edge weights are zero and padded
  node features are zero, so weighted segment ops are automatically correct;
  boolean masks exist for the unweighted cases.
* :class:`DenseGraphBatch` — the **dense world**: ``[B, Nmax, ...]`` padded
  tensors, used by the soft-cluster-assignment poolers whose compute is plain
  batched matmul on the MXU.

Conversions between the two are pure gather/scatter with static output shapes
(reference behavior: ``to_dense_adj`` / ``to_dense_batch``, tgp/src.py:414-452).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

__all__ = [
    "GraphBatch",
    "DenseGraphBatch",
    "from_graphs",
    "to_dense",
    "from_dense",
]


@struct.dataclass
class GraphBatch:
    """A padded, static-shape batch of graphs in packed COO layout.

    Attributes:
      x: ``[N, F]`` node features. Zero on padding rows.
      senders: ``[E]`` int32 source node of each edge (0 on padding edges).
      receivers: ``[E]`` int32 target node of each edge (0 on padding edges).
      edge_weight: ``[E]`` edge weights; **always materialized** (ones for
        unweighted graphs) and **zero on padding edges** so weighted scatter
        ops need no masking.
      node_graph: ``[N]`` int32 graph id per node; clamped to a valid id on
        padding rows (mask-gated ops must use ``node_mask``).
      node_pos: ``[N]`` int32 position of each node *within its graph*
        (< ``max_nodes``); makes sparse→dense a pure scatter.
      node_mask: ``[N]`` bool, True for real nodes.
      edge_mask: ``[E]`` bool, True for real edges.
      num_graphs: static int ``B``.
      max_nodes: static int — padded per-graph width ``Nmax`` (used both by
        dense conversion and by per-graph pooling budgets such as top-k's
        ``ceil(ratio * Nmax)`` supernode budget).
    """

    x: jax.Array
    senders: jax.Array
    receivers: jax.Array
    edge_weight: jax.Array
    node_graph: jax.Array
    node_pos: jax.Array
    node_mask: jax.Array
    edge_mask: jax.Array
    num_graphs: int = struct.field(pytree_node=False)
    max_nodes: int = struct.field(pytree_node=False)
    #: static flag: edges are sorted by receiver (padding edges at r=0 sort
    #: first and carry zero weight, so sorted-CSR kernels stay correct) —
    #: set by the collator via ``sort_edges=True`` to unlock the Pallas
    #: segment-sum path.
    edges_sorted: bool = struct.field(pytree_node=False, default=False)
    #: static flag: ``node_mask`` may exclude nodes that still have live
    #: edge slots (set by masked pooling — ``TopkPooling(pool_mode=
    #: "masked")`` shrinks the mask without touching edges).  Consumers
    #: that normalize over the adjacency (``gcn_norm``) must then weight
    #: edges by endpoint validity; ordinary collated batches skip that
    #: (valid edges only connect valid nodes).
    node_mask_shrunk: bool = struct.field(pytree_node=False, default=False)

    # -- static-per-batch CSR acceleration metadata (round-5 profile:
    # rebuilding these per step cost 8.8 ms of scatter + four 6-8 ms scalar
    # gathers at E=1M; the connectivity is constant across train steps, so
    # the collator precomputes them host-side, scripts/exp_r5_step_trace.py).
    # All optional; ``from_graphs(sort_edges=True)`` fills them in.
    #: ``[rows_pad+1]`` int32 receiver-CSR offsets (rows_pad = ceil(N/256)
    #: ·256, the Pallas kernel's row grid); counts include zero-weight
    #: padding edges (they sit at receiver 0 with weight 0).
    row_ptr: Any = None
    #: transpose (sender-sorted) edge layout for scatter-free SpMM
    #: backward: ``senders_t = senders[perm]`` (ascending — the segment ids
    #: of AᵀX), ``receivers_t = receivers[perm]`` (the gather indices),
    #: ``edge_weight_t = edge_weight[perm]`` (zero on padding), with
    #: ``perm = argsort(senders)``.
    senders_t: Any = None
    receivers_t: Any = None
    edge_weight_t: Any = None
    #: ``[rows_pad+1]`` int32 sender-CSR offsets over ``senders_t``.
    row_ptr_t: Any = None
    #: ``[N]`` f32 weighted in-degree ``Σ_{e: recv=i} |w_e|`` over valid
    #: edges (no self-loops).  Only meaningful while ``node_mask`` covers
    #: the same nodes it was computed for — code that masks nodes (e.g.
    #: masked pooling) must clear it (``replace(in_degree=None)``).
    in_degree: Any = None

    # -- static shape accessors -------------------------------------------
    @property
    def num_nodes(self) -> int:
        """Padded node count N (static)."""
        return self.x.shape[0]

    @property
    def num_edges(self) -> int:
        """Padded edge count E (static)."""
        return self.senders.shape[0]

    @property
    def num_features(self) -> int:
        return self.x.shape[-1]

    # -- traced per-graph quantities --------------------------------------
    def nodes_per_graph(self) -> jax.Array:
        """``[B]`` number of *real* nodes in each graph.

        One-hot contraction, not ``segment_sum``: XLA serializes the
        ``[N]→[B]`` integer scatter on TPU (7.2 ms at N=65k inside the
        round-5 large-graph step), while the ``[B,N]·[N]`` matvec is
        microseconds and exact (counts are small integers in f32)."""
        oh = (self.node_graph[None, :]
              == jnp.arange(self.num_graphs, dtype=jnp.int32)[:, None])
        n_g = jnp.einsum("bn,n->b", oh.astype(jnp.float32),
                         self.node_mask.astype(jnp.float32),
                         precision=jax.lax.Precision.HIGHEST)
        return n_g.astype(jnp.int32)

    def edges_per_graph(self) -> jax.Array:
        """``[B]`` number of *real* edges in each graph (one-hot
        contraction — see :meth:`nodes_per_graph`)."""
        edge_graph = self.node_graph[self.senders]
        oh = (edge_graph[None, :]
              == jnp.arange(self.num_graphs, dtype=jnp.int32)[:, None])
        e_g = jnp.einsum("be,e->b", oh.astype(jnp.float32),
                         self.edge_mask.astype(jnp.float32),
                         precision=jax.lax.Precision.HIGHEST)
        return e_g.astype(jnp.int32)

    @property
    def edge_graph(self) -> jax.Array:
        """``[E]`` graph id of each edge (via its sender)."""
        return self.node_graph[self.senders]

    def with_features(self, x: jax.Array) -> "GraphBatch":
        return self.replace(x=x)  # .replace from flax.struct.dataclass


@struct.dataclass
class DenseGraphBatch:
    """Dense padded batch: ``x [B,Nmax,F]``, ``adj [B,Nmax,Nmax]``, ``mask [B,Nmax]``."""

    x: jax.Array
    adj: jax.Array
    mask: jax.Array

    @property
    def num_graphs(self) -> int:
        return self.x.shape[0]

    @property
    def max_nodes(self) -> int:
        return self.x.shape[1]

    @property
    def num_features(self) -> int:
        return self.x.shape[-1]

    def with_features(self, x: jax.Array) -> "DenseGraphBatch":
        return self.replace(x=x)


# ---------------------------------------------------------------------------
# Host-side collation (numpy; runs outside jit, in the data loader)
# ---------------------------------------------------------------------------


def ceil_to(v: int, m: int) -> int:
    """Round ``v`` up to a multiple of ``m`` (shared padding helper)."""
    return ((v + m - 1) // m) * m


_ceil_to = ceil_to  # internal alias


def from_graphs(
    graphs: Sequence[tuple[np.ndarray, np.ndarray] | tuple[np.ndarray, np.ndarray, np.ndarray]],
    *,
    pad_nodes: int | None = None,
    pad_edges: int | None = None,
    max_nodes: int | None = None,
    node_multiple: int = 8,
    edge_multiple: int = 128,
    sort_edges: bool = False,
    dtype: Any = np.float32,
) -> GraphBatch:
    """Collate a list of ``(x, edge_index[, edge_weight])`` numpy graphs.

    Packs real nodes/edges first, then trailing padding up to ``pad_nodes`` /
    ``pad_edges`` (rounded up to hardware-friendly multiples when not given).
    This replaces PyG's dynamic disjoint-union ``Batch.from_data_list``
    (reference: tgp/data/loaders.py:105-170) with bucketed static shapes.
    """
    B = len(graphs)
    if B == 0:
        raise ValueError("from_graphs needs at least one graph")

    xs, eis, ews = [], [], []
    for g in graphs:
        if len(g) == 3:
            x, ei, ew = g
        else:
            x, ei = g
            ew = None
        x = np.asarray(x, dtype=dtype)
        if x.ndim == 1:
            x = x[:, None]
        ei = np.asarray(ei, dtype=np.int64).reshape(2, -1)
        if ew is None:
            ew = np.ones(ei.shape[1], dtype=dtype)
        xs.append(x)
        eis.append(ei)
        ews.append(np.asarray(ew, dtype=dtype).reshape(-1))

    n_per = [x.shape[0] for x in xs]
    e_per = [ei.shape[1] for ei in eis]
    n_tot, e_tot = sum(n_per), sum(e_per)
    if max_nodes is None:
        max_nodes = max(n_per)
    elif max_nodes < max(n_per):
        raise ValueError(f"max_nodes={max_nodes} < largest graph ({max(n_per)})")
    N = pad_nodes if pad_nodes is not None else _ceil_to(max(n_tot, 1), node_multiple)
    E = pad_edges if pad_edges is not None else _ceil_to(max(e_tot, 1), edge_multiple)
    if N < n_tot or E < e_tot:
        raise ValueError(
            f"padding budget too small: need ({n_tot},{e_tot}), got ({N},{E})"
        )
    F = xs[0].shape[1]

    x_out = np.zeros((N, F), dtype=dtype)
    senders = np.zeros(E, dtype=np.int32)
    receivers = np.zeros(E, dtype=np.int32)
    edge_weight = np.zeros(E, dtype=dtype)
    node_graph = np.full(N, B - 1, dtype=np.int32)
    node_pos = np.zeros(N, dtype=np.int32)
    node_mask = np.zeros(N, dtype=bool)
    edge_mask = np.zeros(E, dtype=bool)

    n_off = e_off = 0
    for g, (x, ei, ew) in enumerate(zip(xs, eis, ews)):
        n, e = x.shape[0], ei.shape[1]
        x_out[n_off : n_off + n] = x
        node_graph[n_off : n_off + n] = g
        node_pos[n_off : n_off + n] = np.arange(n)
        node_mask[n_off : n_off + n] = True
        senders[e_off : e_off + e] = ei[0] + n_off
        receivers[e_off : e_off + e] = ei[1] + n_off
        edge_weight[e_off : e_off + e] = ew
        edge_mask[e_off : e_off + e] = True
        n_off += n
        e_off += e
    # Padding nodes keep node_pos clamped into range for scatter safety.
    node_pos[n_off:] = max_nodes - 1 if max_nodes > 0 else 0

    csr_aux = {}
    if sort_edges:
        order = np.argsort(receivers, kind="stable")
        senders, receivers = senders[order], receivers[order]
        edge_weight, edge_mask = edge_weight[order], edge_mask[order]
        # static CSR metadata (see GraphBatch field docs): rebuilt per step
        # these cost ~9 ms of scatter each at E=1M; host-side they're free
        rows_pad = _ceil_to(max(N, 1), 256)
        counts = np.bincount(receivers, minlength=rows_pad)
        row_ptr = np.zeros(rows_pad + 1, np.int32)
        row_ptr[1:] = np.cumsum(counts).astype(np.int32)
        perm = np.argsort(senders, kind="stable")
        senders_t = senders[perm]
        counts_t = np.bincount(senders_t, minlength=rows_pad)
        row_ptr_t = np.zeros(rows_pad + 1, np.int32)
        row_ptr_t[1:] = np.cumsum(counts_t).astype(np.int32)
        in_degree = np.bincount(
            receivers, weights=np.abs(edge_weight), minlength=N
        )[:N].astype(dtype)
        csr_aux = dict(
            row_ptr=jnp.asarray(row_ptr),
            senders_t=jnp.asarray(senders_t),
            receivers_t=jnp.asarray(receivers[perm]),
            edge_weight_t=jnp.asarray(edge_weight[perm]),
            row_ptr_t=jnp.asarray(row_ptr_t),
            in_degree=jnp.asarray(in_degree),
        )

    return GraphBatch(
        x=jnp.asarray(x_out),
        senders=jnp.asarray(senders),
        receivers=jnp.asarray(receivers),
        edge_weight=jnp.asarray(edge_weight),
        node_graph=jnp.asarray(node_graph),
        node_pos=jnp.asarray(node_pos),
        node_mask=jnp.asarray(node_mask),
        edge_mask=jnp.asarray(edge_mask),
        num_graphs=B,
        max_nodes=max_nodes,
        edges_sorted=sort_edges,
        **csr_aux,
    )


# ---------------------------------------------------------------------------
# Sparse <-> dense conversion (jit-friendly, static shapes)
# ---------------------------------------------------------------------------


def to_dense(batch: GraphBatch, max_nodes: int | None = None) -> DenseGraphBatch:
    """Sparse packed batch → dense padded batch (pure scatter).

    Equivalent of the reference's ``to_dense_batch`` + ``to_dense_adj``
    preprocessing (tgp/src.py:414-452), but with a static ``Nmax`` known from
    the batch metadata rather than computed from data.
    """
    Nmax = max_nodes if max_nodes is not None else batch.max_nodes
    B = batch.num_graphs
    F = batch.num_features

    nm = batch.node_mask
    x_safe = jnp.where(nm[:, None], batch.x, 0.0)
    x_dense = jnp.zeros((B, Nmax, F), batch.x.dtype).at[
        batch.node_graph, batch.node_pos
    ].add(x_safe)
    mask = jnp.zeros((B, Nmax), bool).at[batch.node_graph, batch.node_pos].max(nm)

    eg = batch.edge_graph
    sp = batch.node_pos[batch.senders]
    rp = batch.node_pos[batch.receivers]
    w = jnp.where(batch.edge_mask, batch.edge_weight, 0.0)
    adj = jnp.zeros((B, Nmax, Nmax), batch.edge_weight.dtype).at[eg, sp, rp].add(w)
    return DenseGraphBatch(x=x_dense, adj=adj, mask=mask)


def from_dense(
    dense: DenseGraphBatch,
    *,
    keep_self_loops: bool = True,
) -> GraphBatch:
    """Dense padded batch → sparse packed batch (block-diagonal flatten).

    Every ``B*Nmax`` node slot becomes a flat node (padding marked invalid);
    every ``B*Nmax*Nmax`` adjacency entry becomes an edge slot, masked by
    nonzero weight and endpoint validity.  This is the static-shape analogue
    of the reference's ``dense_to_block_diag`` (tgp/utils/ops.py:53-82) used
    by ``_finalize_sparse_output`` (tgp/src.py:500-557) — intended for small
    pooled graphs where ``Nmax == K``.
    """
    B, K, F = dense.x.shape
    N = B * K
    x = dense.x.reshape(N, F)
    mask = dense.mask.reshape(N)
    node_graph = jnp.repeat(jnp.arange(B, dtype=jnp.int32), K)
    node_pos = jnp.tile(jnp.arange(K, dtype=jnp.int32), B)

    # Edge slots: for each graph, all K*K pairs.
    rows = jax.lax.broadcasted_iota(jnp.int32, (B, K, K), 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (B, K, K), 2)
    goff = (jnp.arange(B, dtype=jnp.int32) * K)[:, None, None]
    senders = (rows + goff).reshape(-1)
    receivers = (cols + goff).reshape(-1)
    w = dense.adj.reshape(-1)
    valid = (
        (w != 0)
        & mask[senders]
        & mask[receivers]
    )
    if not keep_self_loops:
        valid = valid & (senders != receivers)
    w = jnp.where(valid, w, 0.0)
    senders = jnp.where(valid, senders, 0)
    receivers = jnp.where(valid, receivers, 0)

    return GraphBatch(
        x=jnp.where(mask[:, None], x, 0.0),
        senders=senders,
        receivers=receivers,
        edge_weight=w,
        node_graph=node_graph,
        node_pos=node_pos,
        node_mask=mask,
        edge_mask=valid,
        num_graphs=B,
        max_nodes=K,
    )
