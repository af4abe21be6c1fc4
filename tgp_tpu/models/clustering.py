"""Transductive node-clustering model (reference: examples/clustering.py +
examples/clustering_tvgnn.py): MP layers → dense pooler; the soft assignment
``S`` is the clustering; quality via NMI against ground-truth communities."""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from tgp_tpu.graph import GraphBatch
from tgp_tpu.mp.gcn import GCNConv
from tgp_tpu.mp.gtvconv import GTVConv
from tgp_tpu.src import PoolingOutput

__all__ = ["ClusteringModel", "nmi_score"]


class ClusteringModel(nn.Module):
    pooler: nn.Module
    hidden: int = 32
    num_mp_layers: int = 2
    mp_type: str = "gcn"  # 'gcn' | 'gtv' (TVGNN uses GTVConv)
    delta_coeff: float = 0.311

    @nn.compact
    def __call__(self, batch: GraphBatch) -> Tuple[jax.Array, PoolingOutput]:
        h = batch.x
        for _ in range(self.num_mp_layers):
            if self.mp_type == "gtv":
                h = GTVConv(self.hidden, delta_coeff=self.delta_coeff,
                            act="elu")(batch, h)
            else:
                h = nn.relu(GCNConv(self.hidden)(batch, h))
        out = self.pooler(batch.with_features(h))
        s = out.so.s
        return s, out


def nmi_score(labels_true: np.ndarray, labels_pred: np.ndarray) -> float:
    """Normalized mutual information (sklearn host-side, like the
    reference's torchmetrics NMI)."""
    from sklearn.metrics import normalized_mutual_info_score

    return float(normalized_mutual_info_score(labels_true, labels_pred))
