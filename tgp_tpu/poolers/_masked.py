"""Masked (in-place) sparse pooling shared by the score-and-keep family
(Topk/SAG — poolers whose connect is the pure kept-node subgraph
``A' = A[kept, kept]``, reference tgp/connect/base_conn.py:57-112).

Instead of compact-relabeling kept nodes into the ``[B·Kmax]`` supernode
space (four per-edge endpoint gathers + an unsorted pooled conv — ~90 ms
of the 117 ms N=64k/E=1M step, round-5 trace), the pooled graph keeps the
ORIGINAL node space: features are gated by their selection score and
``node_mask`` shrinks to the kept set.  The pooled graph then reuses the
input's receiver-sorted layout and static CSR metadata, so downstream
convs stay on the Pallas fast path with a scatter-free backward.
Per-slot values match the compact path exactly (kept node *i*'s pooled
feature lives at node slot *i* instead of ``cluster_index[i]``) —
pinned in tests/test_masked_pool.py.

NOT applicable to poolers whose connect merges neighborhoods (ASAP's
``SᵀAS`` with soft ego-network assignments) — only pure subgraph
selection composes with masking.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tgp_tpu.graph import GraphBatch
from tgp_tpu.select.base import SelectOutput
from tgp_tpu.src import PoolingOutput

__all__ = ["use_masked_pool", "masked_pool", "masked_lift"]


def use_masked_pool(pool_mode: str, batch: GraphBatch, *,
                    degree_norm: bool, edge_weight_norm: bool) -> bool:
    """Resolve the ``pool_mode`` flag ("compact" | "masked" | "auto");
    auto = masked exactly in the regime where the compact relabel is the
    measured bottleneck (sorted edges + collator CSR metadata +
    E ≥ PALLAS_MIN_EDGES + TPU backend)."""
    if pool_mode == "compact":
        return False
    if pool_mode == "masked":
        return True
    assert pool_mode == "auto", pool_mode
    if degree_norm or edge_weight_norm:
        return False  # compact postprocess variants: keep reference path
    import jax.extend.backend as _backend

    from tgp_tpu.ops.sparse import PALLAS_MIN_EDGES

    return (batch.edges_sorted and batch.row_ptr is not None
            and batch.num_edges >= PALLAS_MIN_EDGES
            and _backend.get_backend().platform not in ("cpu",))


def masked_pool(batch: GraphBatch, so: SelectOutput, *,
                multiplier: float = 1.0,
                remove_self_loops: bool = True) -> PoolingOutput:
    """Gate + mask in the original node space (see module docstring)."""
    keep = so.node_sel_mask
    gate = jnp.where(keep, so.weight * multiplier, 0.0)
    x_m = batch.x * gate[:, None].astype(batch.x.dtype)
    w, m = batch.edge_weight, batch.edge_mask
    w_t = batch.edge_weight_t
    if remove_self_loops:
        noloop = batch.senders != batch.receivers
        w = jnp.where(noloop, w, 0.0)
        m = m & noloop
        if w_t is not None:
            w_t = jnp.where(batch.senders_t != batch.receivers_t, w_t, 0.0)
    pooled = batch.replace(
        x=x_m,
        node_mask=batch.node_mask & keep,
        edge_weight=w,
        edge_mask=m,
        edge_weight_t=w_t,
        in_degree=None,  # degrees must be recomputed under the mask
        node_mask_shrunk=True,  # edges outlive the mask (gcn_norm)
    )
    so = so.replace(extras={**so.extras, "pool_mode": "masked"})
    return PoolingOutput(so=so, graph=pooled)


def masked_lift(x_pool: jax.Array, so: SelectOutput,
                s_inv_op: str) -> jax.Array:
    """Node-space lift: the compact ``x_lift[i] = S[i,c(i)]·x_pool[c(i)]``
    becomes a weight-gated identity."""
    if s_inv_op != "transpose":
        raise NotImplementedError(
            "masked pool_mode implements lift for s_inv_op='transpose' "
            "only")
    gate = jnp.where(so.node_sel_mask, so.weight, 0.0)
    return x_pool * gate[:, None].astype(x_pool.dtype)
