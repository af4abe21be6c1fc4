"""HOSCPool (reference: tgp/poolers/hosc.py:104-384; Duval & Malliaros,
CIKM 2022).  Mixed first-/higher-order mincut over the motif adjacency
``A³`` plus (HOSC-)orthogonality."""

from __future__ import annotations

import jax.numpy as jnp

from tgp_tpu.losses import (
    hosc_orthogonality_loss,
    mincut_loss,
    orthogonality_loss,
    sparse_ho_mincut_loss,
    sparse_mincut_loss,
    unbatched_hosc_orthogonality_loss,
    unbatched_orthogonality_loss,
)
from tgp_tpu.poolers import register_pooler
from tgp_tpu.poolers.dense_base import DenseClusterPooling


@register_pooler("hosc")
class HOSCPooling(DenseClusterPooling):
    mu: float = 0.1
    alpha: float = 0.5

    hosc_ortho: bool = False

    def compute_loss(self, dense, so, adj_pool):
        s, adj = so.s, dense.adj
        cut = ho_cut = jnp.zeros(())
        if self.alpha < 1:
            cut = mincut_loss(adj, s, adj_pool) / self.k
        if self.alpha > 0:
            motif = jnp.einsum("bij,bjk,bkl->bil", adj, adj, adj)
            motif_pool = jnp.einsum("bnk,bnm,bmj->bkj", s, motif, s)
            ho_cut = mincut_loss(motif, s, motif_pool) / self.k
        hosc = (1 - self.alpha) * cut + self.alpha * ho_cut
        if self.mu == 0:
            ortho = jnp.zeros(())
        elif self.hosc_ortho:
            ortho = hosc_orthogonality_loss(s, mask=dense.mask)
        else:
            ortho = orthogonality_loss(s)
        return {"hosc_loss": hosc, "ortho_loss": self.mu * ortho}

    def compute_sparse_loss(self, batch, so):
        s = so.s
        args = (batch.senders, batch.receivers, batch.edge_weight, s,
                batch.node_graph, batch.num_graphs, batch.node_mask)
        cut = ho_cut = jnp.zeros(())
        if self.alpha < 1:
            cut = sparse_mincut_loss(*args) / self.k
        if self.alpha > 0:
            ho_cut = sparse_ho_mincut_loss(*args) / self.k
        hosc = (1 - self.alpha) * cut + self.alpha * ho_cut
        if self.mu == 0:
            ortho = jnp.zeros(())
        elif self.hosc_ortho:
            ortho = unbatched_hosc_orthogonality_loss(
                s, batch.node_graph, batch.num_graphs, batch.node_mask)
        else:
            ortho = unbatched_orthogonality_loss(
                s, batch.node_graph, batch.num_graphs, batch.node_mask)
        return {"hosc_loss": hosc, "ortho_loss": self.mu * ortho}
