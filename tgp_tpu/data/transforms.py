"""Host-side data transforms (reference: tgp/data/transforms.py).

These run in the data pipeline (NumPy, outside jit) on raw
``(x, edge_index[, edge_weight])`` graph tuples — the analogue of PyG
pre-transforms.  ``PreCoarsening`` lives in
:mod:`tgp_tpu.data.precoarsening`.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

__all__ = ["NormalizeAdj", "SortNodes"]


@dataclass
class NormalizeAdj:
    """``A → (1−δ)·I + δ·D^{-1/2} A D^{-1/2}`` ≡ ``I − δ·L_sym``
    (reference: tgp/data/transforms.py:30-136; JustBalance's
    ``data_transforms`` pre-transform)."""

    delta: float = 0.85
    add_self_loops: bool = True

    def __call__(self, graph):
        x, ei = graph[0], np.asarray(graph[1])
        ew = np.asarray(graph[2], np.float64) if len(graph) > 2 else np.ones(
            ei.shape[1])
        n = x.shape[0]
        deg = np.zeros(n)
        np.add.at(deg, ei[1], ew)
        dinv = np.where(deg > 0, 1.0 / np.sqrt(np.maximum(deg, 1e-12)), 0.0)
        w_norm = self.delta * ew * dinv[ei[0]] * dinv[ei[1]]
        # merge with (1-δ)·I self-loops
        loops = np.arange(n)
        ei_out = np.concatenate([ei, np.stack([loops, loops])], axis=1)
        w_out = np.concatenate([w_norm, np.full(n, 1.0 - self.delta)])
        # coalesce duplicates (existing self-loops)
        key = ei_out[0].astype(np.int64) * n + ei_out[1]
        order = np.argsort(key, kind="stable")
        key, w_out = key[order], w_out[order]
        uniq, first = np.unique(key, return_index=True)
        sums = np.add.reduceat(w_out, first)
        ei_final = np.stack([uniq // n, uniq % n]).astype(ei.dtype)
        return (x, ei_final, sums.astype(np.float32))


@dataclass
class SortNodes:
    """Sort nodes by label, remapping edge_index (reference:
    tgp/data/transforms.py:139-181).  Graph tuples gain a ``y`` element:
    ``(x, edge_index, edge_weight, y)``."""

    descending: bool = False

    def __call__(self, graph):
        x, ei = np.asarray(graph[0]), np.asarray(graph[1])
        ew = np.asarray(graph[2]) if len(graph) > 2 else None
        y = np.asarray(graph[3]) if len(graph) > 3 else None
        if y is None:
            raise ValueError("SortNodes needs node labels y")
        order = np.argsort(-y if self.descending else y, kind="stable")
        inv = np.empty_like(order)
        inv[order] = np.arange(order.size)
        x2, y2 = x[order], y[order]
        ei2 = inv[ei]
        if ew is not None:
            return (x2, ei2, ew, y2)
        return (x2, ei2, y2)
