"""JustBalancePool (reference: tgp/poolers/just_balance.py:83-322; Bianchi,
NLDL 2023).  ``balance_loss`` = −Tr√(SᵀS); ships the ``NormalizeAdj``
pre-transform hook (``data_transforms``, just_balance.py:303-322)."""

from __future__ import annotations

from tgp_tpu.losses import just_balance_loss, unbatched_just_balance_loss
from tgp_tpu.poolers import register_pooler
from tgp_tpu.poolers.dense_base import DenseClusterPooling


@register_pooler("jb")
class JustBalancePooling(DenseClusterPooling):
    normalize_loss: bool = True
    loss_coeff: float = 1.0

    def compute_loss(self, dense, so, adj_pool):
        return {
            "balance_loss": self.loss_coeff * just_balance_loss(
                so.s, mask=dense.mask, normalize_loss=self.normalize_loss),
        }

    def compute_sparse_loss(self, batch, so):
        return {
            "balance_loss": self.loss_coeff * unbatched_just_balance_loss(
                so.s, batch.node_graph, batch.num_graphs, batch.node_mask,
                normalize_loss=self.normalize_loss),
        }

    @staticmethod
    def data_transforms():
        from tgp_tpu.data.transforms import NormalizeAdj

        return NormalizeAdj(delta=0.85)
