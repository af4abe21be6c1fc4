"""Lift operators (reference: tgp/lift/)."""
from tgp_tpu.lift.base import (
    base_lift,
    lift_dense_batched,
    lift_dense_unbatched,
    lift_sparse,
)

__all__ = ["base_lift", "lift_dense_batched", "lift_dense_unbatched",
           "lift_sparse"]
