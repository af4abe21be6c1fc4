"""NMFPooling (reference: tgp/poolers/nmf.py:92-244; Bacciu & Di Sotto
2019).  Host-eager NMF factorization pooling with fixed-k collation."""

from __future__ import annotations

from dataclasses import dataclass

from tgp_tpu.poolers import register_pooler
from tgp_tpu.poolers.host_base import HostPooling
from tgp_tpu.precoarsen.nmf import nmf_level


@register_pooler("nmf")
@dataclass
class NMFPooling(HostPooling):
    k: int = 8
    seed: int = 0

    IS_DENSE = True

    def level_fn(self):
        return nmf_level

    def level_kwargs(self):
        return {"k": self.k, "seed": self.seed}
