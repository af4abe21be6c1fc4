"""DiffPool (reference: tgp/poolers/diffpool.py:98-331; Ying et al.,
NeurIPS 2018).  ``link_loss`` (‖A−SSᵀ‖_F) + ``entropy_loss``."""

from __future__ import annotations

from tgp_tpu.losses import (
    entropy_loss,
    link_pred_loss,
    sparse_link_pred_loss,
    unbatched_entropy_loss,
)
from tgp_tpu.poolers import register_pooler
from tgp_tpu.poolers.dense_base import DenseClusterPooling


@register_pooler("diff")
class DiffPool(DenseClusterPooling):
    link_loss_coeff: float = 1.0
    ent_loss_coeff: float = 1.0
    normalize_loss: bool = False

    def compute_loss(self, dense, so, adj_pool):
        return {
            "link_loss": self.link_loss_coeff * link_pred_loss(
                so.s, dense.adj, normalize_loss=self.normalize_loss,
                mask=dense.mask),
            # reference normalizes entropy by the total VALID node count
            # (num_nodes = mask.sum(), diffpool.py:217-218)
            "entropy_loss": self.ent_loss_coeff * entropy_loss(
                so.s, mask=dense.mask),
        }

    def compute_sparse_loss(self, batch, so):
        return {
            "link_loss": self.link_loss_coeff * sparse_link_pred_loss(
                so.s, batch.senders, batch.receivers, batch.edge_weight,
                batch.node_graph, batch.num_graphs, batch.node_mask,
                normalize_loss=self.normalize_loss),
            "entropy_loss": self.ent_loss_coeff * unbatched_entropy_loss(
                so.s, node_mask=batch.node_mask),
        }
