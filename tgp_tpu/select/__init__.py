"""Select operators (reference: tgp/select/)."""
from tgp_tpu.select.base import (
    SelectOutput,
    cluster_to_select_output,
    compact_select_output,
)
from tgp_tpu.select.topk import TopkSelect, topk_select_from_scores

__all__ = ["SelectOutput", "cluster_to_select_output",
           "compact_select_output", "TopkSelect", "topk_select_from_scores"]
