"""Graclus selection — greedy heavy-edge matching (reference:
tgp/select/graclus_select.py:13-84, which delegates to the C++/CUDA
``torch_cluster.graclus_cluster``).

Device path: weight-ranked maximal matching via the same Blelloch loop as
edge contraction (each node merges with the heaviest available incident
edge).  ``torch_cluster``'s kernel scans vertices in random order; ours
processes edges in globally weight-sorted order — both are greedy maximal
matchings, ours deterministic.  A host-side C++ implementation (classic
random-order vertex scan) lives in :mod:`tgp_tpu._native` for the
precoarsening pipeline.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from tgp_tpu.graph import GraphBatch
from tgp_tpu.select.base import SelectOutput
from tgp_tpu.select.edge_contraction import matching

__all__ = ["graclus_select"]


def graclus_select(batch: GraphBatch, *, weighted: bool = True,
                   s_inv_op: str = "transpose",
                   matching_impl: str = "auto") -> SelectOutput:
    N, E = batch.num_nodes, batch.num_edges
    s, r, em = batch.senders, batch.receivers, batch.edge_mask
    w = batch.edge_weight if weighted else jnp.ones(E)
    order = jnp.lexsort((-w, ~em))
    rank = jnp.zeros(E, jnp.int32).at[order].set(jnp.arange(E, dtype=jnp.int32))
    match = matching(rank, batch, matching_impl)

    cluster = jnp.arange(N, dtype=jnp.int32)
    # matched pair collapses onto the smaller node index (deterministic root)
    root = jnp.minimum(s, r)
    other = jnp.maximum(s, r)
    upd_idx = jnp.where(match, other, N)
    upd_val = jnp.where(match, root, 0)
    cluster = jnp.concatenate([cluster, jnp.zeros(1, jnp.int32)]).at[
        upd_idx].set(upd_val.astype(jnp.int32))[:N]

    return SelectOutput(
        cluster_index=cluster,
        weight=jnp.ones(N, jnp.float32),
        node_sel_mask=batch.node_mask,
        node_graph=batch.node_graph,
        node_mask=batch.node_mask,
        cluster_graph=batch.node_graph,
        cluster_pos=batch.node_pos,
        num_clusters=N,
        num_graphs=batch.num_graphs,
        max_clusters=batch.max_nodes,
        partial=False,
        s_inv_op=s_inv_op,
    )
