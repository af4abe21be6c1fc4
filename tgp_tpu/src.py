"""SRC(L) core: ``PoolingOutput`` and the pooling base classes.

TPU re-design of the reference's runtime (tgp/src.py, 692 LoC):

* :class:`PoolingOutput` (reference: tgp/src.py:19-116) — what every pooler
  returns.  Instead of loose ``(x, edge_index, edge_weight, batch)`` fields it
  carries a pooled :class:`~tgp_tpu.graph.GraphBatch` (sparse output) and/or a
  :class:`~tgp_tpu.graph.DenseGraphBatch` (dense output), plus the
  :class:`~tgp_tpu.select.SelectOutput` and the named aux-loss dict.
* :class:`SRCPooling` (reference: tgp/src.py:119-307) — base flax module with
  the select/reduce/connect/lift plumbing.  The reference's ``cached=True``
  select/connect caching is intentionally **not** a module flag here: under
  ``jit`` the idiomatic equivalent is to precompute the ``SelectOutput``
  outside the step function and pass it in via ``so=`` (see SURVEY §7).
* :class:`DenseSRCPooling` (reference: tgp/src.py:310-557) — dense base:
  accepts sparse batches and densifies (``preprocessing``), or accepts
  pre-densified :class:`DenseGraphBatch` directly; ``sparse_output=True``
  converts the pooled dense graph to a block-diagonal sparse batch.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from tgp_tpu.connect.base import ConnectConfig, sparse_connect
from tgp_tpu.graph import DenseGraphBatch, GraphBatch, from_dense, to_dense
from tgp_tpu.lift.base import base_lift
from tgp_tpu.reduce.base import base_reduce
from tgp_tpu.select.base import SelectOutput

__all__ = ["PoolingOutput", "SRCPooling", "DenseSRCPooling"]


@struct.dataclass
class PoolingOutput:
    """Result of one pooling step (reference: tgp/src.py:19-116)."""

    so: SelectOutput
    graph: Optional[GraphBatch] = None  # pooled sparse batch
    dense: Optional[DenseGraphBatch] = None  # pooled dense batch
    loss: Dict[str, jax.Array] = struct.field(default_factory=dict)

    # -- convenience accessors ------------------------------------------
    @property
    def x(self) -> jax.Array:
        return self.graph.x if self.graph is not None else self.dense.x

    @property
    def mask(self) -> jax.Array:
        """Pooled-node validity (= ``so.out_mask`` in the reference)."""
        return (
            self.graph.node_mask if self.graph is not None else self.dense.mask
        )

    @property
    def has_loss(self) -> bool:
        return bool(self.loss)

    def get_loss_value(self, name: str) -> jax.Array:
        return self.loss[name]

    def loss_sum(self) -> jax.Array:
        """Σ of all aux losses (examples add this to the task loss;
        reference: examples/classification.py:119-121)."""
        if not self.loss:
            return jnp.zeros(())
        return sum(self.loss.values())


class SRCPooling(nn.Module):
    """Base class for sparse-world poolers.

    Subclasses define config fields and implement ``__call__``; the helpers
    here provide the shared Reduce/Connect/Lift plumbing (the reference's
    dispatch methods, tgp/src.py:168-229).  Class-level capability flags feed
    the cheatsheet (reference: tgp/utils/cheatsheet.py:27-75).
    """

    # lift configuration (reference: BaseLift(matrix_op=lift,
    # reduce_op=lift_red_op), e.g. tgp/poolers/topk.py) — inherited by every
    # pooler as flax config fields
    lift_op: str = "precomputed"
    lift_red_op: str = "sum"

    # capability flags — PLAIN class attributes, not dataclass fields:
    # subclasses override with bare assignments (``IS_TRAINABLE = True``)
    # and both class- and instance-level reads see the override (a field
    # default would shadow un-annotated subclass overrides on instances)
    IS_DENSE = False
    HAS_LOSS = False
    IS_TRAINABLE = False
    IS_PRECOARSENABLE = False
    SUPPORTS_SPARSE_OUT = True
    #: the pooler's ``__call__`` accepts a pre-densified
    #: :class:`~tgp_tpu.graph.DenseGraphBatch` (model-level regime
    #: dispatch gate, models/prepare.py)
    ACCEPTS_DENSE_BATCH = False

    def reduce(self, x: jax.Array, so: SelectOutput, **kw) -> jax.Array:
        return base_reduce(x, so, **kw)

    def lift(self, x_pool: jax.Array, so: SelectOutput) -> jax.Array:
        return base_lift(x_pool, so, matrix_op=self.lift_op,
                         reduce_op=self.lift_red_op)

    def connect(self, batch: GraphBatch, so: SelectOutput,
                cfg: ConnectConfig = ConnectConfig()):
        return sparse_connect(
            batch.senders, batch.receivers, batch.edge_weight, batch.edge_mask,
            so, cfg,
        )

    def pooled_graph(self, x_pool: jax.Array, edges, so: SelectOutput,
                     batch: GraphBatch) -> GraphBatch:
        """Assemble the pooled :class:`GraphBatch` from reduce+connect output."""
        s, r, w, m = edges
        out_mask = so.out_mask()
        return GraphBatch(
            x=jnp.where(out_mask[:, None], x_pool, 0.0),
            senders=s,
            receivers=r,
            edge_weight=w,
            edge_mask=m,
            node_graph=so.cluster_graph,
            node_pos=so.cluster_pos,
            node_mask=out_mask,
            num_graphs=batch.num_graphs,
            max_nodes=so.max_clusters,
        )


class DenseSRCPooling(SRCPooling):
    """Base for dense-world poolers (reference: tgp/src.py:310-557).

    The canonical forward skeleton (reference instance
    tgp/poolers/mincut.py:150-289):
      batched:   densify → select → reduce (SᵀX) → connect (SᵀAS) →
                 compute_loss → postprocess → [sparse_output]
      unbatched: select ([N,K]) → compute_sparse_loss → reduce
                 (segment outer) → connect (SpMM twin)
    """

    IS_DENSE = True
    ACCEPTS_DENSE_BATCH = True

    @staticmethod
    def ensure_dense(batch, adj_transpose: bool = False) -> DenseGraphBatch:
        """Accept a sparse :class:`GraphBatch` or pre-densified
        :class:`DenseGraphBatch` (reference ``_ensure_batched_inputs``,
        tgp/src.py:454-491).  ``adj_transpose`` pre-transposes the densified
        adjacency (reference tgp/src.py:442-443) so the pooled output lands
        in the transposed convention dense MP layers expect; a pre-densified
        input is taken as already being in the caller's convention."""
        if isinstance(batch, DenseGraphBatch):
            return batch
        dense = to_dense(batch)
        if adj_transpose:
            dense = dense.replace(adj=jnp.swapaxes(dense.adj, -1, -2))
        return dense

    @staticmethod
    def finalize_sparse_output(dense: DenseGraphBatch) -> GraphBatch:
        """Dense pooled ``[B,K,K]`` → block-diagonal sparse batch
        (reference ``_finalize_sparse_output``, tgp/src.py:500-557).  Under
        static shapes invalid supernodes are masked, not dropped."""
        return from_dense(dense)


# ---------------------------------------------------------------------------
# Precoarsening protocol (reference: tgp/src.py:560-692)
# ---------------------------------------------------------------------------


class PrecoarseningMixin:
    """Protocol for poolers whose selection is feature-independent and
    non-trainable, enabling offline coarsening (reference ``Precoarsenable``
    + ``BasePrecoarseningMixin``, tgp/src.py:560-692).

    Host-side: ``precoarsen(x, edge_index, edge_weight) -> level dict`` runs
    in NumPy (it is dataset preprocessing, like the reference's
    ``pre_transform``) and produces serializable per-level artifacts that the
    data loader collates into device-ready :class:`SelectOutput`s.
    """

    def precoarsen_graph(self, edge_index, num_nodes, edge_weight=None):
        raise NotImplementedError

    def multi_level_precoarsen(self, edge_index, num_nodes, edge_weight=None,
                               levels: int = 1):
        """Greedy rollout: each level's pooled graph feeds the next
        (reference: tgp/src.py:570-622)."""
        out = []
        for _ in range(levels):
            lvl = self.precoarsen_graph(edge_index, num_nodes, edge_weight)
            out.append(lvl)
            edge_index = lvl["edge_index"]
            edge_weight = lvl.get("edge_weight")
            num_nodes = lvl["num_clusters"]
        return out
