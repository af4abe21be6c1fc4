"""``SelectOutput`` — the load-bearing data structure of the SRC framework.

TPU re-design of the reference's ``SelectOutput``
(tgp/select/base_select.py:76-486).  The reference stores ``s`` either as a
sparse COO ``[N,K]`` tensor or dense ``[N,K]``/``[B,N,K]``; here the dual
representation is made concrete and static-shape:

* **sparse (hard/partial) assignments** — ``cluster_index [N]`` (global
  supernode id per node), ``weight [N]``, ``node_sel_mask [N]`` (which nodes
  participate), plus per-supernode metadata ``cluster_graph``/``cluster_pos``
  with a static total supernode budget ``num_clusters``.  This replaces the
  COO triplet (``node_index``/``cluster_index``/``weight``,
  base_select.py:276-288) — under static shapes *every* node has a slot and
  validity is a mask, not a shorter index list.
* **dense (soft) assignments** — ``s [B,N,K]`` (batched) or ``[N,K]``
  (unbatched multi-graph), with ``in_mask`` for padded rows.

``s_inv`` never needs to be materialized for the transpose case (the default
``s_inv_op='transpose'``); the Moore–Penrose pseudo-inverse is computed
lazily in the lift (cf. ``set_s_inv``, base_select.py:290-300).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import struct

from tgp_tpu.ops.segment import segment_count, segment_sum, segment_topk_rank

__all__ = ["SelectOutput", "cluster_to_select_output",
           "compact_select_output"]


@struct.dataclass
class SelectOutput:
    """Output of a ``Select`` operator (sparse or dense layout)."""

    # --- dense soft assignment ---
    s: Optional[jax.Array] = None  # [B,N,K] batched | [N,K] unbatched
    in_mask: Optional[jax.Array] = None  # [B,N] (batched dense only)

    # --- sparse hard assignment ---
    cluster_index: Optional[jax.Array] = None  # [N] int32, global supernode id
    weight: Optional[jax.Array] = None  # [N]
    node_sel_mask: Optional[jax.Array] = None  # [N] node is selected/assigned

    # --- carried batch structure ---
    node_graph: Optional[jax.Array] = None  # [N]
    node_mask: Optional[jax.Array] = None  # [N]
    cluster_graph: Optional[jax.Array] = None  # [C] (sparse layout)
    cluster_pos: Optional[jax.Array] = None  # [C] position within graph
    #: explicit supernode-validity override (``[B,K]`` dense / ``[C]``
    #: sparse).  Needed when validity cannot be derived from ``s`` — e.g.
    #: the dense top-k layout stores *signed* score gates in ``s``, so the
    #: default ``s.sum(-2) > 0`` test would misreport negatively-scored
    #: (but selected) supernodes as invalid.
    cluster_mask: Optional[jax.Array] = None

    # --- extra per-method arrays (NDP's L, MaxCut scores, BNPool q_z, ...) ---
    extras: Dict[str, Any] = struct.field(default_factory=dict)

    # --- static metadata ---
    num_clusters: int = struct.field(pytree_node=False, default=0)
    num_graphs: int = struct.field(pytree_node=False, default=1)
    max_clusters: int = struct.field(pytree_node=False, default=0)
    s_inv_op: str = struct.field(pytree_node=False, default="transpose")
    partial: bool = struct.field(pytree_node=False, default=False)
    # EigenPool mode count H (static — ``s`` is a [N, H·K] Θ matrix when >0,
    # so reduce/lift must do the mode-major reshape even under jit, where an
    # ``extras`` leaf would be a tracer)
    num_modes: int = struct.field(pytree_node=False, default=0)

    # ------------------------------------------------------------------
    @property
    def is_dense(self) -> bool:
        return self.s is not None

    @property
    def is_sparse(self) -> bool:
        return self.cluster_index is not None

    @property
    def is_batched_dense(self) -> bool:
        return self.s is not None and self.s.ndim == 3

    @property
    def num_nodes(self) -> int:
        if self.is_sparse:
            return self.cluster_index.shape[0]
        return self.s.shape[-2]

    def out_mask(self) -> jax.Array:
        """Supernode validity (reference: ``out_mask`` via
        ``get_mask_from_dense_s``, base_select.py:234-253 /
        tgp/utils/ops.py:85-132).

        Sparse layout → ``[C]`` bool (supernode has ≥1 assigned node);
        batched dense → ``[B,K]``; unbatched dense → ``[B,K]`` via
        ``node_graph`` segments.
        """
        if self.cluster_mask is not None:
            return self.cluster_mask
        if self.is_sparse:
            m = self.node_sel_mask
            if m is None:
                m = self.node_mask
            cnt = segment_count(self.cluster_index, self.num_clusters, mask=m)
            return cnt > 0
        if self.s.ndim == 3:
            return self.s.sum(-2) > 0
        # [N,K] unbatched, multi-graph
        col = segment_sum(self.s, self.node_graph, self.num_graphs,
                          mask=self.node_mask)
        return col > 0

    def is_expressive(self) -> jax.Array:
        """Whether the assignment is *expressive* — every valid node
        participates (reference: ``SelectOutput.is_expressive``,
        base_select.py:210-232).  Traced boolean scalar."""
        if self.is_sparse:
            return jnp.all(~self.node_mask | self.node_sel_mask)
        # |s| mass, not signed sum: the dense top-k layout stores signed
        # score gates in ``s`` (see ``cluster_mask``), so a selected node
        # with a negative score must still count as participating; soft
        # assignments are non-negative, so abs() is a no-op there
        if self.s.ndim == 3:
            row_mass = jnp.abs(self.s).sum(-1)
            m = self.in_mask if self.in_mask is not None else jnp.ones(
                row_mass.shape, bool)
            return jnp.all(~m | (row_mass > 0))
        row_mass = jnp.abs(self.s).sum(-1)
        m = self.node_mask if self.node_mask is not None else jnp.ones(
            row_mass.shape, bool)
        return jnp.all(~m | (row_mass > 0))

    def pooled_node_graph(self) -> jax.Array:
        """Graph id of each pooled supernode (``reduce_batch``,
        reference tgp/reduce/base_reduce.py:14-53).  Sparse layout only."""
        return self.cluster_graph

    def with_extra(self, **kw) -> "SelectOutput":
        extras = dict(self.extras)
        extras.update(kw)
        return self.replace(extras=extras)


def cluster_to_select_output(
    cluster_index: jax.Array,
    batch,
    *,
    weight: Optional[jax.Array] = None,
    node_sel_mask: Optional[jax.Array] = None,
    num_clusters: int,
    max_clusters: int,
    cluster_graph: Optional[jax.Array] = None,
    partial: bool = False,
    s_inv_op: str = "transpose",
    extras: Optional[Dict[str, Any]] = None,
) -> SelectOutput:
    """Build a sparse :class:`SelectOutput` from a cluster-assignment vector
    (reference: ``cluster_to_s``, tgp/select/base_select.py:19-71).

    ``cluster_index`` maps each node to a global supernode id in
    ``[0, num_clusters)``; invalid nodes are masked by ``node_sel_mask``
    (default: the batch's ``node_mask``).  ``cluster_graph`` (graph id per
    supernode) is derived by scattering node graph ids when not given.
    """
    node_graph = batch.node_graph
    node_mask = batch.node_mask
    if node_sel_mask is None:
        node_sel_mask = node_mask
    else:
        node_sel_mask = node_sel_mask & node_mask
    if weight is None:
        weight = jnp.ones(cluster_index.shape[0], jnp.float32)
    weight = jnp.where(node_sel_mask, weight, 0.0)
    ci_safe = jnp.where(node_sel_mask, cluster_index, 0)

    if cluster_graph is None:
        # graph of a supernode = max over graph ids of its members (all equal)
        cg = jax.ops.segment_max(
            jnp.where(node_sel_mask, node_graph, -1), ci_safe,
            num_segments=num_clusters,
        )
        cluster_graph = jnp.maximum(cg, 0).astype(jnp.int32)

    # position of each supernode within its graph: rank by supernode id
    occupied = segment_count(ci_safe, num_clusters, mask=node_sel_mask) > 0
    cluster_pos = segment_topk_rank(
        -jnp.arange(num_clusters, dtype=jnp.float32), cluster_graph,
        batch.num_graphs, mask=occupied,
    )

    return SelectOutput(
        cluster_index=ci_safe.astype(jnp.int32),
        weight=weight,
        node_sel_mask=node_sel_mask,
        node_graph=node_graph,
        node_mask=node_mask,
        cluster_graph=cluster_graph,
        cluster_pos=cluster_pos.astype(jnp.int32),
        num_clusters=num_clusters,
        num_graphs=batch.num_graphs,
        max_clusters=max_clusters,
        partial=partial,
        s_inv_op=s_inv_op,
        extras=extras or {},
    )


def compact_select_output(so: SelectOutput, budget_per_graph: int
                          ) -> SelectOutput:
    """Repack a sparse total assignment into a smaller graph-major budget.

    Total-assignment selectors (graclus/kmis/ec) use supernode ids in the
    *node* id space (budget N), so pooled graphs keep the input's static
    size with mostly-masked slots.  This relabels occupied supernodes to
    ``graph · budget + rank`` (rank = position among the graph's occupied
    supernodes, ordered by old id), shrinking every downstream tensor.

    ``budget_per_graph`` must be ≥ the max occupied supernodes of any graph
    (e.g. ``ceil(max_nodes/2) + 1`` for matchings-with-singletons worst
    cases are ``max_nodes``; pick per your method's guarantee).  A too-small
    budget would silently corrupt results, so overflow trips
    ``jax.debug.check`` (error under ``jax.enable_checks`` / checkify;
    prints under plain jit) and the overflowing supernodes are masked out.
    """
    assert so.is_sparse, "compact_select_output needs a sparse SelectOutput"
    C_old = so.num_clusters
    occupied = so.out_mask()
    slot = segment_topk_rank(
        -jnp.arange(C_old, dtype=jnp.float32), so.cluster_graph,
        so.num_graphs, mask=occupied)
    ok = occupied & (slot < budget_per_graph)
    overflow = occupied & (slot >= budget_per_graph)
    jax.lax.cond(
        jnp.any(overflow),
        lambda n: jax.debug.print(
            "ERROR compact_select_output: budget_per_graph="
            f"{budget_per_graph} overflowed "
            "({n} supernodes dropped) — results are corrupt, raise the "
            "budget", n=n),
        lambda n: None,
        jnp.sum(overflow))
    new_id = jnp.where(
        ok, so.cluster_graph * budget_per_graph + slot, 0).astype(jnp.int32)

    # remap node assignments through the old→new table
    table_id = jnp.where(ok, new_id, 0)
    table_ok = ok
    ci = so.cluster_index
    node_ok = so.node_sel_mask & table_ok[ci]
    ci_new = jnp.where(node_ok, table_id[ci], 0)

    C_new = so.num_graphs * budget_per_graph
    return SelectOutput(
        cluster_index=ci_new.astype(jnp.int32),
        weight=jnp.where(node_ok, so.weight, 0.0),
        node_sel_mask=node_ok,
        node_graph=so.node_graph,
        node_mask=so.node_mask,
        cluster_graph=(jnp.arange(C_new, dtype=jnp.int32)
                       // budget_per_graph),
        cluster_pos=(jnp.arange(C_new, dtype=jnp.int32) % budget_per_graph),
        num_clusters=C_new,
        num_graphs=so.num_graphs,
        max_clusters=budget_per_graph,
        partial=so.partial,
        s_inv_op=so.s_inv_op,
        extras=so.extras,
    )
