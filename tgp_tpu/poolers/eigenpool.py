"""EigenPooling (reference: tgp/poolers/eigenpool.py:90-281; Ma et al., KDD
2019).  EigenPoolSelect / EigenPoolReduce / EigenPoolConnect /
EigenPoolLift; feature dim expands to ``H·F`` (forced unbatched mode,
reference eigenpool.py:118-145)."""

from __future__ import annotations

from dataclasses import dataclass

from tgp_tpu.poolers import register_pooler
from tgp_tpu.poolers.host_base import HostPooling
from tgp_tpu.precoarsen.eigenpool import eigenpool_level
from tgp_tpu.reduce.eigenpool import eigenpool_reduce


@register_pooler("eigen")
@dataclass
class EigenPooling(HostPooling):
    k: int = 8
    num_modes: int = 3
    seed: int = 0
    degree_norm: bool = True
    #: normalized vs combinatorial subgraph Laplacian for the Θ modes
    #: (reference ``normalized``, eigenpool_select.py:17-68)
    normalized: bool = True

    IS_DENSE = True

    def level_fn(self):
        return eigenpool_level

    def level_kwargs(self):
        return {"k": self.k, "num_modes": self.num_modes, "seed": self.seed,
                "normalized": self.normalized,
                "degree_norm": self.degree_norm}

    def reduce_level(self, x, so):
        return eigenpool_reduce(x, so)

    def __call__(self, batch, *, so=None, lifting: bool = False, x=None):
        from tgp_tpu.lift.eigenpool import eigenpool_lift

        if lifting:
            return eigenpool_lift(x if x is not None else batch.x, so)
        return super().__call__(batch, so=so)
