"""Precoarsening registry + ``PreCoarsening`` transform.

Reference: ``PreCoarsening`` (tgp/data/transforms.py:184-448): accepts a
per-level config list (alias / ``(alias, kwargs)`` / dict), validates
non-trainability, **collapses consecutive identical configs into runs**
executed once via ``multi_level_precoarsening``, and attaches the per-level
artifacts to the graph.  Here a transformed graph becomes
``(x, edge_index, edge_weight, levels)`` where ``levels`` is a list of
level-artifact dicts (see the level functions' docstrings for the schema).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple, Union

import numpy as np

PRECOARSENERS: Dict[str, Callable] = {}


def register_precoarsener(alias: str, fn: Optional[Callable] = None,
                          multi_level: bool = False):
    def deco(f):
        PRECOARSENERS[alias] = (f, multi_level)
        return f

    if fn is not None:
        return deco(fn)
    return deco


def _load_all():
    from tgp_tpu.precoarsen.eigenpool import eigenpool_level
    from tgp_tpu.precoarsen.graclus import graclus_level
    from tgp_tpu.precoarsen.ndp import ndp_level
    from tgp_tpu.precoarsen.nmf import nmf_level
    from tgp_tpu.precoarsen.sep import sep_levels

    PRECOARSENERS.setdefault("ndp", (ndp_level, False))
    PRECOARSENERS.setdefault("graclus", (graclus_level, False))
    PRECOARSENERS.setdefault("nmf", (nmf_level, False))
    PRECOARSENERS.setdefault("eigen", (eigenpool_level, False))
    PRECOARSENERS.setdefault("sep", (sep_levels, True))


def precoarsen_graph(alias: str, edge_index, num_nodes, edge_weight=None,
                     levels: int = 1, **kw) -> List[dict]:
    """Greedy multi-level rollout of one method (reference:
    ``multi_level_precoarsening``, tgp/src.py:570-622).  SEP derives all
    levels from a single coding tree instead (tgp/poolers/sep.py:190-268)."""
    _load_all()
    if alias not in PRECOARSENERS:
        raise ValueError(
            f"unknown precoarsener {alias!r}; available: {sorted(PRECOARSENERS)}")
    fn, multi = PRECOARSENERS[alias]
    if multi:
        return fn(edge_index, num_nodes, edge_weight, levels=levels, **kw)
    out = []
    ei, ew, n = edge_index, edge_weight, num_nodes
    for _ in range(levels):
        lvl = fn(ei, n, ew, **kw)
        out.append(lvl)
        ei, ew, n = lvl["edge_index"], lvl["edge_weight"], lvl["num_clusters"]
    return out


@dataclass
class PreCoarsening:
    """Dataset pre-transform: attach per-level coarsening artifacts.

    ``poolers`` is a single config or a per-level list; each config is an
    alias string or ``(alias, kwargs)``.  Consecutive identical configs are
    collapsed into one multi-level run (reference collapse logic,
    tgp/data/transforms.py:370-398).
    """

    poolers: Union[str, Tuple, Sequence] = "ndp"
    levels: int = 1
    kwargs: Dict[str, Any] = field(default_factory=dict)

    def _normalized(self) -> List[Tuple[str, dict]]:
        cfgs = self.poolers
        if isinstance(cfgs, str):
            return [(cfgs, self.kwargs)] * self.levels
        if (isinstance(cfgs, tuple) and len(cfgs) == 2
                and isinstance(cfgs[1], dict)):
            # a single ("alias", kwargs) config repeated over levels
            return [cfgs] * self.levels
        out = []
        for c in cfgs:
            if isinstance(c, str):
                # bare alias inherits the shared kwargs (they used to be
                # silently dropped for per-level lists)
                out.append((c, dict(self.kwargs)))
            elif (isinstance(c, tuple) and len(c) == 2
                    and isinstance(c[1], dict)):
                out.append(c)
            else:
                raise ValueError(
                    "per-level pooler config must be 'alias' or "
                    f"('alias', kwargs-dict); got {c!r}")
        return out

    def __call__(self, graph):
        from tgp_tpu.data.transforms import split_graph_tuple

        x, ei, ew, y = split_graph_tuple(graph)
        n = x.shape[0]

        cfgs = self._normalized()
        # collapse consecutive identical configs into runs
        runs: List[Tuple[str, dict, int]] = []
        for alias, kw in cfgs:
            if runs and runs[-1][0] == alias and runs[-1][1] == kw:
                runs[-1] = (alias, kw, runs[-1][2] + 1)
            else:
                runs.append((alias, kw, 1))

        levels: List[dict] = []
        cur_ei, cur_ew, cur_n = ei, ew, n
        for alias, kw, count in runs:
            lvls = precoarsen_graph(alias, cur_ei, cur_n, cur_ew,
                                    levels=count, **kw)
            levels.extend(lvls)
            last = lvls[-1]
            cur_ei, cur_ew = last["edge_index"], last["edge_weight"]
            cur_n = last["num_clusters"]

        return ((x, ei) + ((ew,) if ew is not None else ())
                + ((y,) if y is not None else ()) + (levels,))
