"""Shape-bucketed batch inference — the serving-side companion of
:class:`~tgp_tpu.data.loaders.BucketedGraphLoader`.

The reference has no inference path beyond ``model.eval()`` (it inherits
torch's dynamic shapes).  Under XLA every new input shape is a fresh
compile, so a production predictor must bound the set of shapes it ever
presents to ``jit``.  :class:`Predictor` does that with **geometric
bucketing**: per request, each batch's (pad_nodes, pad_edges, max_nodes)
budget is rounded up to the next power-of-two-ish bucket, so the number of
distinct compiled executables is O(log max_graph_size) for the lifetime of
the process, regardless of what sizes arrive.

Results are exact: padding rows/edges are masked by construction
(`GraphBatch` semantics), and short batches are cycle-padded then sliced
back, so every input graph is scored exactly once.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import numpy as np

from tgp_tpu.graph import from_graphs

__all__ = ["Predictor", "geometric_budget"]


def geometric_budget(n: int, base: int = 64, growth: float = 2.0) -> int:
    """Smallest ``base·growth^k`` ≥ ``n`` — the bucket ceiling for a size."""
    if growth <= 1.0:
        raise ValueError(f"growth must be > 1.0, got {growth}")
    b = float(base)
    while b < n:
        b *= growth
    return int(b)


class Predictor:
    """Batch-inference wrapper with a bounded jit-cache.

    Args:
      apply_fn: ``(params, GraphBatch) -> logits`` (e.g.
        ``lambda p, b: model.apply(p, b)[0]``).  Jitted once per input
        shape bucket.
      params: the trained parameter pytree.
      batch_size: static graphs-per-batch of every compiled executable.
      node_base/edge_base: smallest bucket ceilings (smaller bases = less
        padding, more buckets).
      out_width: trailing output width hint (e.g. ``num_classes``) so an
        empty input returns rank-2 ``(0, out_width)`` from the FIRST call
        — without it the width is only learned on the first non-empty
        call, and ``np.concatenate`` over serving chunks would trip on a
        leading empty chunk (ADVICE r4).
      donate: unused hook for future buffer donation.

    Call with a list of ``(x, edge_index[, edge_weight])`` numpy graphs;
    returns stacked outputs ``[len(graphs), ...]`` in input order.
    """

    def __init__(self, apply_fn: Callable, params, *, batch_size: int = 8,
                 node_base: int = 64, edge_base: int = 256,
                 sort_edges: bool = False,
                 out_width: Optional[int] = None):
        self._apply = jax.jit(apply_fn)
        self._params = params
        self.batch_size = int(batch_size)
        self.node_base = int(node_base)
        self.edge_base = int(edge_base)
        self.sort_edges = sort_edges
        self._seen_buckets: set = set()
        # trailing output dims; refined to the true shape on first call
        self._out_tail: tuple = (
            (int(out_width),) if out_width is not None else ())

    @property
    def num_compiled(self) -> int:
        """Distinct executables compiled so far (cache telemetry).

        Counted by distinct (pad_nodes, pad_edges, max_nodes) budget tuples
        served — one compile each, since batch_size is fixed.  (jit's
        private ``_cache_size`` is version-dependent; own counter is
        stable.)
        """
        return len(self._seen_buckets)

    def _budget(self, graphs: Sequence) -> tuple[int, int, int]:
        ns = [g[0].shape[0] for g in graphs]
        es = [g[1].shape[1] for g in graphs]
        pad_nodes = geometric_budget(sum(ns), self.node_base)
        pad_edges = geometric_budget(max(sum(es), 1), self.edge_base)
        max_nodes = geometric_budget(max(ns), self.node_base)
        return pad_nodes, pad_edges, max_nodes

    def __call__(self, graphs: Sequence) -> np.ndarray:
        B = self.batch_size
        if len(graphs) == 0:
            # keep the rank consistent with non-empty calls ([n, C]) so
            # np.concatenate over serving chunks never trips on an
            # empty chunk; before any call the width is unknown -> (0,)
            return np.empty((0,) + self._out_tail, dtype=np.float32)
        outs = []
        for start in range(0, len(graphs), B):
            chunk = list(graphs[start : start + B])
            n_valid = len(chunk)
            while len(chunk) < B:  # keep B static; surplus sliced off below
                chunk.append(chunk[-1])
            # budget from the padded chunk so repeats can't overflow
            pn, pe, mx = self._budget(chunk)
            self._seen_buckets.add((pn, pe, mx))
            batch = from_graphs(chunk, pad_nodes=pn, pad_edges=pe,
                                max_nodes=mx, sort_edges=self.sort_edges)
            out = np.asarray(self._apply(self._params, batch))
            self._out_tail = tuple(out.shape[1:])
            outs.append(out[:n_valid])
        return np.concatenate(outs, axis=0)
