"""Batching / data loading: list-of-graphs → static-shape GraphBatch stream.

Replaces the reference's ``PoolDataLoader``/``PoolCollater``/``PooledBatch``
(tgp/data/loaders.py:13-170).  Because everything under ``jit`` needs static
shapes, the loader computes **fixed padding budgets** over the dataset
(max total nodes/edges of any batch, rounded up) so every batch compiles to
the same executable.
"""

from __future__ import annotations

from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from tgp_tpu.graph import GraphBatch, ceil_to as _ceil_to, from_graphs

__all__ = ["GraphLoader", "BucketedGraphLoader", "compute_budgets",
           "worst_case_cycled"]


def worst_case_cycled(per: Sequence[int], batch_size: int) -> int:
    """Worst-case total of ``batch_size`` draws from ``per`` (descending
    counts), where short datasets pad batches by CYCLING the graph list —
    each item can appear up to ``ceil(B/L)`` times.  Shared by the base
    and pooled loaders so their budgets always agree."""
    per = sorted(per, reverse=True)
    L = len(per)
    if batch_size >= L:
        reps, rem = divmod(batch_size, L)
        return reps * sum(per) + sum(per[:rem])
    return sum(per[:batch_size])


def _auto_sort_edges(sort_edges: Optional[bool], pad_edges: int) -> bool:
    """``None`` (auto) enables receiver-sorted collation + static CSR
    metadata exactly in the regime where the Pallas sorted-CSR pipeline
    engages (edge budget ≥ ``PALLAS_MIN_EDGES``) — large-graph batches get
    the fast path (round-5: 47 vs 8.5 M edges/s end-to-end) without
    paying the host-side argsort/bincount on small-batch streams."""
    if sort_edges is not None:
        return sort_edges
    from tgp_tpu.ops.sparse import PALLAS_MIN_EDGES

    return pad_edges >= PALLAS_MIN_EDGES


def compute_budgets(graphs: Sequence, batch_size: int,
                    node_multiple: int = 8, edge_multiple: int = 128
                    ) -> Tuple[int, int, int]:
    """Worst-case (pad_nodes, pad_edges, max_nodes_per_graph) for any
    ``batch_size``-sized batch of ``graphs``."""
    n_per = sorted((g[0].shape[0] for g in graphs), reverse=True)
    e_per = sorted((g[1].shape[1] for g in graphs), reverse=True)
    pad_nodes = _ceil_to(worst_case_cycled(n_per, batch_size), node_multiple)
    pad_edges = _ceil_to(
        max(worst_case_cycled(e_per, batch_size), 1), edge_multiple)
    return pad_nodes, pad_edges, n_per[0]


class GraphLoader:
    """Minibatch iterator with static padding budgets.

    Args:
      graphs: list of ``(x, edge_index[, edge_weight])`` numpy graphs.
      labels: optional per-graph labels, yielded alongside each batch.
      batch_size: graphs per batch (last short batch is dropped when
        ``drop_last`` or padded with repeats to keep B static otherwise).
    """

    def __init__(self, graphs: Sequence, labels: Optional[np.ndarray] = None,
                 batch_size: int = 32, shuffle: bool = False, seed: int = 0,
                 pad_nodes: Optional[int] = None,
                 pad_edges: Optional[int] = None,
                 max_nodes: Optional[int] = None,
                 sort_edges: Optional[bool] = None):
        self.graphs = list(graphs)
        self.labels = None if labels is None else np.asarray(labels)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)
        pn, pe, mx = compute_budgets(self.graphs, batch_size)
        self.pad_nodes = pad_nodes or pn
        self.pad_edges = pad_edges or pe
        # dataset-global per-graph width so every batch has identical
        # static shapes (no per-batch recompiles)
        self.max_nodes = max_nodes or mx
        self.sort_edges = _auto_sort_edges(sort_edges, self.pad_edges)

    def __len__(self) -> int:
        return (len(self.graphs) + self.batch_size - 1) // self.batch_size

    def _iter_with_indices(self) -> Iterator:
        order = np.arange(len(self.graphs))
        if self.shuffle:
            self.rng.shuffle(order)
        B = self.batch_size
        for start in range(0, len(order), B):
            idx = order[start : start + B]
            if len(idx) < B:  # keep B static: pad by cycling the order
                idx = np.take(order, np.arange(start, start + B),
                              mode="wrap")
            batch = from_graphs(
                [self.graphs[i] for i in idx],
                pad_nodes=self.pad_nodes, pad_edges=self.pad_edges,
                max_nodes=self.max_nodes, sort_edges=self.sort_edges,
            )
            y = None if self.labels is None else np.asarray(self.labels[idx])
            yield batch, y, idx

    def __iter__(self) -> Iterator:
        for batch, y, _ in self._iter_with_indices():
            if y is not None:
                yield batch, y
            else:
                yield batch


class BucketedGraphLoader:
    """Size-bucketed minibatch iterator (SURVEY §7: "bucketed padding of
    N/E per batch").

    A single global padding budget (``GraphLoader``) pays the worst-case
    batch's padding on EVERY batch — on size-skewed datasets most rows are
    dead padding.  Bucketing sorts graphs by node count into
    ``num_buckets`` quantile buckets and batches within a bucket, so each
    bucket gets its own (much tighter) static budget.  The trade is a
    bounded number of compiled executables: at most ``num_buckets`` distinct
    input shapes, known up front via :attr:`budgets`.

    Yields the same ``(GraphBatch, labels)`` pairs as :class:`GraphLoader`;
    batch order interleaves buckets (shuffled per epoch when ``shuffle``).
    """

    def __init__(self, graphs: Sequence, labels: Optional[np.ndarray] = None,
                 batch_size: int = 32, num_buckets: int = 4,
                 shuffle: bool = False, seed: int = 0,
                 sort_edges: Optional[bool] = None):
        self._sort_edges_arg = sort_edges
        self.graphs = list(graphs)
        self.labels = None if labels is None else np.asarray(labels)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)

        sizes = np.array([g[0].shape[0] for g in self.graphs])
        order = np.argsort(sizes, kind="stable")
        num_buckets = max(1, min(num_buckets, len(order)))
        # contiguous quantile buckets over the size-sorted order; merge
        # buckets that share a budget (uniform datasets collapse to one)
        splits = np.array_split(order, num_buckets)
        self.buckets: List[np.ndarray] = []
        self.budgets: List[Tuple[int, int, int]] = []
        for part in splits:
            if len(part) == 0:
                continue
            budget = compute_budgets([self.graphs[i] for i in part],
                                     batch_size)
            if self.budgets and budget == self.budgets[-1]:
                # Equal per-part budgets do NOT imply the union obeys them:
                # edge counts are not ordered by the node-size sort, so a
                # shuffled batch mixing both parts' heavy-edge graphs can
                # exceed pad_edges.  Re-budget over the union so merged
                # buckets stay safe under any within-bucket batch.
                merged = np.concatenate([self.buckets[-1], part])
                self.buckets[-1] = merged
                self.budgets[-1] = compute_budgets(
                    [self.graphs[i] for i in merged], batch_size)
            else:
                self.buckets.append(part)
                self.budgets.append(budget)

    def __len__(self) -> int:
        B = self.batch_size
        return sum((len(b) + B - 1) // B for b in self.buckets)

    def __iter__(self) -> Iterator:
        B = self.batch_size
        chunks = []  # (bucket_id, index array) per batch
        for bi, bucket in enumerate(self.buckets):
            idx = bucket.copy()
            if self.shuffle:
                self.rng.shuffle(idx)
            for start in range(0, len(idx), B):
                sel = idx[start : start + B]
                if len(sel) < B:  # keep B static: cycle within the bucket
                    sel = np.take(idx, np.arange(start, start + B),
                                  mode="wrap")
                chunks.append((bi, sel))
        if self.shuffle:
            self.rng.shuffle(chunks)
        for bi, sel in chunks:
            pn, pe, mx = self.budgets[bi]
            batch = from_graphs([self.graphs[i] for i in sel],
                                pad_nodes=pn, pad_edges=pe, max_nodes=mx,
                                sort_edges=_auto_sort_edges(
                                    self._sort_edges_arg, pe))
            if self.labels is not None:
                yield batch, np.asarray(self.labels[sel])
            else:
                yield batch
