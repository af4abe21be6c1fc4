"""NDPPooling (reference: tgp/poolers/ndp.py:57-142; Bianchi et al., TNNLS
2020).  NDPSelect / BaseReduce / KronConnect / BaseLift — host-eager; use
:class:`~tgp_tpu.precoarsen.PreCoarsening` for the training pipeline."""

from __future__ import annotations

from dataclasses import dataclass

from tgp_tpu.poolers import register_pooler
from tgp_tpu.poolers.host_base import HostPooling
from tgp_tpu.precoarsen.ndp import ndp_level


@register_pooler("ndp")
@dataclass
class NDPPooling(HostPooling):
    sparse_threshold: float = 1e-2
    seed: int = 0

    def level_fn(self):
        return ndp_level

    def level_kwargs(self):
        return {"sparse_threshold": self.sparse_threshold, "seed": self.seed}
