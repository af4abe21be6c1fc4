"""Pallas TPU kernels."""

from tgp_tpu.ops.pallas.bmm import bmm_pallas
from tgp_tpu.ops.pallas.sddmm import banded_sddmm_pallas, sddmm_banded
from tgp_tpu.ops.pallas.segment_spmm import (banded_sorted_spmm_pallas,
                                             check_band_contract,
                                             segment_sum_sorted,
                                             sort_edges_csr,
                                             sorted_segment_sum_pallas,
                                             spmm_banded, spmm_sorted)

__all__ = [
    "banded_sddmm_pallas",
    "banded_sorted_spmm_pallas",
    "bmm_pallas",
    "check_band_contract",
    "sddmm_banded",
    "segment_sum_sorted",
    "sort_edges_csr",
    "sorted_segment_sum_pallas",
    "spmm_banded",
    "spmm_sorted",
]
