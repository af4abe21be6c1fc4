"""Reduce operators (reference: tgp/reduce/)."""
from tgp_tpu.reduce.base import (
    base_reduce,
    reduce_dense_batched,
    reduce_dense_unbatched,
    reduce_sparse,
)
from tgp_tpu.reduce.global_reduce import global_reduce

__all__ = ["base_reduce", "reduce_dense_batched", "reduce_dense_unbatched",
           "reduce_sparse", "global_reduce"]
