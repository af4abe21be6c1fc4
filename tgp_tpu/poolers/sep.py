"""SEPPooling (reference: tgp/poolers/sep.py:93-271; Wu et al., ICML 2022).
Structural-entropy coding-tree pooling; ``multi_level_precoarsening``
derives all levels from one tree (via
:func:`tgp_tpu.precoarsen.sep.sep_levels`)."""

from __future__ import annotations

from dataclasses import dataclass

from tgp_tpu.poolers import register_pooler
from tgp_tpu.poolers.host_base import HostPooling
from tgp_tpu.precoarsen.sep import sep_levels


@register_pooler("sep")
@dataclass
class SEPPooling(HostPooling):
    max_height: int = 2

    def level_fn(self):
        def one_level(ei, n, ew, **kw):
            return sep_levels(ei, n, ew, levels=1,
                              max_height=self.max_height)[0]

        return one_level
