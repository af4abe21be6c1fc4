"""Collation of precoarsened graphs into device-ready static-shape batches.

Replaces the reference's hook-based ``collate``/``separate`` for
``SelectOutput`` (tgp/data/collate.py:81-185,336-403) and
``PooledBatch``/``PoolDataLoader`` (tgp/data/loaders.py:13-170): per-level
sparse assignments are block-diagonally offset into a packed global
supernode space, dense assignments are row-concatenated ``[N, K]``, and
everything is padded to dataset-wide static budgets so training steps
compile once.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from tgp_tpu.graph import GraphBatch, ceil_to as _ceil_to
from tgp_tpu.select.base import SelectOutput

__all__ = ["collate_level", "separate_level", "PooledGraphLoader",
           "LevelBatch"]


from flax import struct


@struct.dataclass
class LevelBatch:
    """One pooling level: a device ``SelectOutput`` (mapping the previous
    level's node space to this level's supernode space) and the pooled
    connectivity as a ``GraphBatch`` skeleton (x zeros, filled in-model).
    A pytree, so it passes through ``jit`` boundaries."""

    so: SelectOutput
    graph: GraphBatch

    def place_features(self, x_pool):
        """Put reduce output into this level's packed pooled node space
        ``[pad_clusters, F]`` (sparse reduce is already packed; dense
        ``[B,K,F]`` flattens graph-major, then pads)."""
        if x_pool.ndim == 3:
            B, K, F = x_pool.shape
            x_pool = x_pool.reshape(B * K, F)
        pad = self.graph.num_nodes - x_pool.shape[0]
        if pad > 0:
            x_pool = jnp.concatenate(
                [x_pool, jnp.zeros((pad, x_pool.shape[1]), x_pool.dtype)])
        return jnp.where(self.graph.node_mask[:, None], x_pool, 0.0)


def collate_level(levels: Sequence[dict], prev_node_offsets: np.ndarray,
                  prev_pad_nodes: int, pad_clusters: int, pad_edges: int,
                  max_clusters_per_graph: int,
                  feature_dim: int = 1) -> LevelBatch:
    """Collate one level across the batch.

    ``prev_node_offsets[g]``: where graph *g*'s rows start in the previous
    level's packed node space; ``prev_pad_nodes``: its padded size.
    """
    B = len(levels)
    kind = levels[0]["kind"]
    k_per = [int(l["num_clusters"]) for l in levels]
    c_off = np.concatenate([[0], np.cumsum(k_per)[:-1]]).astype(np.int64)
    C_tot = int(sum(k_per))
    assert C_tot <= pad_clusters, (C_tot, pad_clusters)

    cluster_graph = np.zeros(pad_clusters, np.int32)
    cluster_pos = np.zeros(pad_clusters, np.int32)
    out_node_mask = np.zeros(pad_clusters, bool)
    pos_runner = 0
    for g, k in enumerate(k_per):
        cluster_graph[c_off[g]: c_off[g] + k] = g
        cluster_pos[c_off[g]: c_off[g] + k] = np.arange(k)
        out_node_mask[c_off[g]: c_off[g] + k] = True
    cluster_graph[C_tot:] = B - 1

    # pooled edges (block-diagonal offset)
    senders = np.zeros(pad_edges, np.int32)
    receivers = np.zeros(pad_edges, np.int32)
    edge_weight = np.zeros(pad_edges, np.float32)
    edge_mask = np.zeros(pad_edges, bool)
    e_run = 0
    for g, l in enumerate(levels):
        ei, ew = np.asarray(l["edge_index"]), np.asarray(l["edge_weight"])
        e = ei.shape[1]
        assert e_run + e <= pad_edges
        senders[e_run:e_run + e] = ei[0] + c_off[g]
        receivers[e_run:e_run + e] = ei[1] + c_off[g]
        edge_weight[e_run:e_run + e] = ew
        edge_mask[e_run:e_run + e] = True
        e_run += e

    pooled_graph = GraphBatch(
        x=jnp.zeros((pad_clusters, feature_dim), jnp.float32),
        senders=jnp.asarray(senders),
        receivers=jnp.asarray(receivers),
        edge_weight=jnp.asarray(edge_weight),
        node_graph=jnp.asarray(cluster_graph),
        node_pos=jnp.asarray(cluster_pos),
        node_mask=jnp.asarray(out_node_mask),
        edge_mask=jnp.asarray(edge_mask),
        num_graphs=B,
        max_nodes=max_clusters_per_graph,
    )

    # previous-level node-space arrays
    node_graph = np.full(prev_pad_nodes, B - 1, np.int32)
    node_mask_prev = np.zeros(prev_pad_nodes, bool)

    if kind == "sparse":
        cluster_index = np.zeros(prev_pad_nodes, np.int32)
        weight = np.zeros(prev_pad_nodes, np.float32)
        sel_mask = np.zeros(prev_pad_nodes, bool)
        any_partial = any(l.get("partial", False) for l in levels)
        for g, l in enumerate(levels):
            ci = np.asarray(l["cluster_index"])
            w = np.asarray(l["weight"])
            n = ci.shape[0]
            o = int(prev_node_offsets[g])
            valid = ci >= 0
            cluster_index[o:o + n] = np.where(valid, ci + c_off[g], 0)
            weight[o:o + n] = np.where(valid, w, 0.0)
            sel_mask[o:o + n] = valid
            node_graph[o:o + n] = g
            node_mask_prev[o:o + n] = True
        so = SelectOutput(
            cluster_index=jnp.asarray(cluster_index),
            weight=jnp.asarray(weight),
            node_sel_mask=jnp.asarray(sel_mask),
            node_graph=jnp.asarray(node_graph),
            node_mask=jnp.asarray(node_mask_prev),
            cluster_graph=jnp.asarray(cluster_graph),
            cluster_pos=jnp.asarray(cluster_pos),
            num_clusters=pad_clusters,
            num_graphs=B,
            max_clusters=max_clusters_per_graph,
            partial=any_partial,
        )
    elif kind in ("dense", "eigen"):
        K = max(k_per)
        if len(set(k_per)) != 1:
            # the pooled graph packs supernodes at cumsum(k_per) offsets but
            # dense [B,K,F] reduce output flattens with a uniform K stride —
            # varying per-graph cluster counts would silently misalign
            # features with supernode rows
            raise ValueError(
                "dense/eigen precoarsen levels need a uniform per-graph "
                f"cluster count (fixed_k); got {sorted(set(k_per))}")
        if kind == "eigen":
            H = int(levels[0]["num_modes"])
            width = H * K
            key = "theta"
        else:
            width = K
            key = "s"
        s = np.zeros((prev_pad_nodes, width), np.float32)
        for g, l in enumerate(levels):
            mat = np.asarray(l[key], np.float32)
            n = mat.shape[0]
            o = int(prev_node_offsets[g])
            s[o:o + n, : mat.shape[1]] = mat
            node_graph[o:o + n] = g
            node_mask_prev[o:o + n] = True
        extras = {}
        num_modes = 0
        if kind == "eigen":
            num_modes = int(levels[0]["num_modes"])
            extras = {"num_modes": np.int32(num_modes)}
        so = SelectOutput(
            s=jnp.asarray(s),
            node_graph=jnp.asarray(node_graph),
            node_mask=jnp.asarray(node_mask_prev),
            cluster_graph=jnp.asarray(cluster_graph),
            cluster_pos=jnp.asarray(cluster_pos),
            num_clusters=K,
            num_graphs=B,
            max_clusters=K,
            partial=False,
            extras=extras,
            num_modes=num_modes,
        )
    else:
        raise ValueError(f"unknown level kind {kind!r}")

    return LevelBatch(so=so, graph=pooled_graph)


def separate_level(lb: LevelBatch, prev_node_offsets: np.ndarray,
                   n_per_prev: Sequence[int]) -> List[dict]:
    """Inverse of :func:`collate_level`: split a collated ``LevelBatch``
    back into per-graph level dicts (the reference's ``separate`` hook,
    tgp/data/collate.py:336-403).  ``prev_node_offsets`` / ``n_per_prev``
    locate each graph's rows in the previous level's packed node space."""
    so, g = lb.so, lb.graph
    B = g.num_graphs
    cluster_graph = np.asarray(g.node_graph)
    out_mask = np.asarray(g.node_mask)
    k_per = [int((out_mask & (cluster_graph == i)).sum()) for i in range(B)]
    c_off = np.concatenate([[0], np.cumsum(k_per)[:-1]]).astype(np.int64)

    senders = np.asarray(g.senders)
    receivers = np.asarray(g.receivers)
    ew = np.asarray(g.edge_weight)
    em = np.asarray(g.edge_mask)
    e_graph = cluster_graph[senders]

    out: List[dict] = []
    is_sparse = so.cluster_index is not None
    for i in range(B):
        o, n = int(prev_node_offsets[i]), int(n_per_prev[i])
        esel = em & (e_graph == i)
        ei_local = np.stack([senders[esel] - c_off[i],
                             receivers[esel] - c_off[i]]).astype(np.int64)
        level = {
            "num_clusters": k_per[i],
            "edge_index": ei_local,
            "edge_weight": ew[esel].astype(np.float32),
        }
        if is_sparse:
            ci = np.asarray(so.cluster_index)[o:o + n]
            sel = np.asarray(so.node_sel_mask)[o:o + n]
            level["kind"] = "sparse"
            level["cluster_index"] = np.where(sel, ci - c_off[i], -1)
            level["weight"] = np.asarray(so.weight)[o:o + n]
            level["partial"] = bool(so.partial)
        else:
            s = np.asarray(so.s)[o:o + n]
            if "num_modes" in so.extras:
                level["kind"] = "eigen"
                level["num_modes"] = int(so.extras["num_modes"])
                level["theta"] = s
            else:
                level["kind"] = "dense"
                level["s"] = s[:, : k_per[i]]
        out.append(level)
    return out


class PooledGraphLoader:
    """Minibatch iterator over precoarsened graphs
    (``(x, edge_index[, edge_weight], levels)`` tuples)."""

    def __init__(self, graphs: Sequence, labels=None, batch_size: int = 32,
                 shuffle: bool = False, seed: int = 0):
        from tgp_tpu.data.loaders import GraphLoader

        self.with_weight = len(graphs[0]) == 4
        base = [g[:3] if self.with_weight else g[:2] for g in graphs]
        self.levels_per_graph = [g[-1] for g in graphs]
        self.num_levels = len(self.levels_per_graph[0])
        self.base_loader = GraphLoader(base, labels, batch_size=batch_size,
                                       shuffle=shuffle, seed=seed)
        self.batch_size = batch_size

        # per-level dataset-wide budgets (bounding the cycled worst case —
        # shared with the base loader so both always budget identically)
        from tgp_tpu.data.loaders import worst_case_cycled as _worst

        self.level_budgets = []
        for lvl in range(self.num_levels):
            ks = sorted((int(l[lvl]["num_clusters"])
                         for l in self.levels_per_graph), reverse=True)
            es = sorted((int(np.asarray(l[lvl]["edge_index"]).shape[1])
                         for l in self.levels_per_graph), reverse=True)
            pad_c = _ceil_to(max(_worst(ks, batch_size), 1), 8)
            pad_e = _ceil_to(max(_worst(es, batch_size), 1), 128)
            self.level_budgets.append((pad_c, pad_e, ks[0]))

    def __len__(self):
        return len(self.base_loader)

    def __iter__(self):
        for out in self._iter_with_indices():
            yield out[:-1]

    def _iter_with_indices(self):
        """Like ``__iter__`` but also yields the source-graph indices of the
        batch — short batches are padded by cycling, so accuracy loops must
        dedup on these (same contract as ``GraphLoader._iter_with_indices``)."""
        order_iter = self.base_loader._iter_with_indices()
        for batch, y, idx in order_iter:
            level_batches = []
            # previous level's packed node offsets: level 0 = base batch
            n_per = [self.base_loader.graphs[i][0].shape[0] for i in idx]
            prev_off = np.concatenate([[0], np.cumsum(n_per)[:-1]])
            prev_pad = self.base_loader.pad_nodes
            F = batch.num_features
            for lvl in range(self.num_levels):
                pad_c, pad_e, kmax = self.level_budgets[lvl]
                levels = [self.levels_per_graph[i][lvl] for i in idx]
                lb = collate_level(levels, prev_off, prev_pad, pad_c, pad_e,
                                   kmax, feature_dim=F)
                level_batches.append(lb)
                k_per = [int(l["num_clusters"]) for l in levels]
                prev_off = np.concatenate([[0], np.cumsum(k_per)[:-1]])
                prev_pad = pad_c
            if y is not None:
                yield batch, level_batches, y, idx
            else:
                yield batch, level_batches, idx
