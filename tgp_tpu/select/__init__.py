"""Select operators (reference: tgp/select/)."""
from tgp_tpu.select.base import (
    SelectOutput,
    cluster_to_select_output,
    compact_select_output,
)
from tgp_tpu.select.topk import TopkSelect, topk_select_from_scores


def degree_scorer(batch):
    """Weighted in-degree node score (reference: ``degree_scorer``,
    tgp/select/kmis_select.py:21-32)."""
    from tgp_tpu.ops.sparse import weighted_degree

    return weighted_degree(batch.receivers, batch.edge_weight,
                           batch.num_nodes, mask=batch.edge_mask)

__all__ = ["SelectOutput", "cluster_to_select_output",
           "compact_select_output", "TopkSelect", "topk_select_from_scores",
           "degree_scorer"]
