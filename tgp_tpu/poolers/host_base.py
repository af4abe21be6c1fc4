"""Host-eager pooler base for the precoarsenable, non-trainable methods.

NDP/SEP/NMF/EigenPool selection runs through scipy/sklearn on the host in
the reference too (SURVEY §3.3: the CPU boundary sits inside
``pre_transform``); these poolers therefore execute **eagerly** (never under
``jit``) — per-graph NumPy level functions + device-side reduce.  The heavy
path for training is the offline :class:`~tgp_tpu.precoarsen.PreCoarsening`
pipeline; these classes exist for API parity (``get_pooler('ndp')`` etc.)
and ad-hoc use.

They mimic the flax module calling convention (``init``/``apply``) so the
uniform pooler harness treats them interchangeably with trainable poolers.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from tgp_tpu.data.pooled_loader import collate_level
from tgp_tpu.graph import GraphBatch
from tgp_tpu.graph import ceil_to as _ceil_to
from tgp_tpu.reduce.base import base_reduce
from tgp_tpu.src import PoolingOutput


@dataclass
class HostPooling:
    """Eager pooler driven by a per-graph level function."""

    IS_DENSE = False
    HAS_LOSS = False
    IS_TRAINABLE = False
    IS_PRECOARSENABLE = True

    # linen-API shims --------------------------------------------------
    def init(self, rngs, *args, **kwargs):
        return {}

    def apply(self, params, *args, **kwargs):
        return self(*args, **kwargs)

    # ------------------------------------------------------------------
    def level_fn(self) -> Callable:
        raise NotImplementedError

    def level_kwargs(self) -> Dict[str, Any]:
        return {}

    def _per_graph_levels(self, batch: GraphBatch) -> List[dict]:
        s = np.asarray(batch.senders)
        r = np.asarray(batch.receivers)
        w = np.asarray(batch.edge_weight)
        em = np.asarray(batch.edge_mask)
        ng = np.asarray(batch.node_graph)
        nm = np.asarray(batch.node_mask)
        counts = np.asarray(batch.nodes_per_graph())
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        fn, kw = self.level_fn(), self.level_kwargs()
        out = []
        for g in range(batch.num_graphs):
            n = int(counts[g])
            o = int(starts[g])
            e_sel = em & (ng[s] == g)
            ei_local = np.stack([s[e_sel] - o, r[e_sel] - o])
            w_local = w[e_sel]
            out.append(fn(ei_local, n, w_local, **kw))
        return out

    def reduce_level(self, x, so):
        return base_reduce(x, so)

    def __call__(self, batch: GraphBatch, *, so=None, lifting: bool = False,
                 x=None):
        from tgp_tpu.lift.base import base_lift

        if lifting:
            return base_lift(x if x is not None else batch.x, so)

        counts = np.asarray(batch.nodes_per_graph())
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        levels = self._per_graph_levels(batch)
        k_tot = sum(int(l["num_clusters"]) for l in levels)
        e_tot = sum(int(np.asarray(l["edge_index"]).shape[1]) for l in levels)
        pad_c = _ceil_to(max(k_tot, 1), 8)
        pad_e = _ceil_to(max(e_tot, 1), 128)
        kmax = max(int(l["num_clusters"]) for l in levels)
        lb = collate_level(levels, starts, batch.num_nodes, pad_c, pad_e,
                           kmax, feature_dim=batch.num_features)
        x_pool = self.reduce_level(batch.x, lb.so)
        graph = lb.graph.replace(x=lb.place_features(x_pool))
        return PoolingOutput(so=lb.so, graph=graph)
