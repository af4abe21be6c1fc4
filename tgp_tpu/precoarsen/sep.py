"""SEP — structural-entropy coding-tree pooling (host side).

Reference: ``SEPSelect`` + ``PartitionTree``
(tgp/select/sep_select.py:45-1271; Wu et al., ICML 2022).  A coding tree of
bounded height is built by (1) greedy agglomerative merging of root children
minimizing two-level structural entropy, then (2) height compression by
repeatedly deleting the internal node whose removal increases entropy least.
Each tree layer yields one pooling level's hard partition, so **all levels
come from a single tree** (the reference's ``multi_level_select``,
sep_select.py:190-268).

This is an independent implementation of the published algorithm (greedy
structural-entropy minimization, Li & Pan 2016), not a port of the
reference's heap code; tie-breaking may differ.
"""

from __future__ import annotations

import heapq
import math
from typing import Dict, List, Optional

import numpy as np

from tgp_tpu.precoarsen.common import coalesce_numpy, to_csr

__all__ = ["sep_coding_tree", "sep_levels"]


class _Node:
    __slots__ = ("id", "children", "parent", "vol", "cut", "leaves")

    def __init__(self, nid, vol=0.0, cut=0.0):
        self.id = nid
        self.children: List[int] = []
        self.parent: Optional[int] = None
        self.vol = vol
        self.cut = cut
        self.leaves: List[int] = []


def sep_coding_tree(edge_index, num_nodes, edge_weight=None,
                    max_height: int = 2, use_native: bool = True):
    """Build the coding tree; returns (nodes dict, root id).

    The merge phase runs in C++ (``_native.sep_merge_tree``) when the
    toolchain is available, falling back to the Python heap agglomeration
    (identical algorithm)."""
    if use_native:
        try:
            return _sep_coding_tree_native(edge_index, num_nodes,
                                           edge_weight, max_height)
        except Exception:
            pass
    A = to_csr(edge_index, num_nodes, edge_weight)
    A = A.maximum(A.T).tocsr()
    deg = np.asarray(A.sum(1)).ravel()
    V = float(deg.sum())
    if V <= 0:
        V = 1.0

    nodes: Dict[int, _Node] = {}
    next_id = num_nodes
    # leaves
    for i in range(num_nodes):
        n = _Node(i, vol=float(deg[i]), cut=float(deg[i] - A[i, i]))
        n.leaves = [i]
        nodes[i] = n

    # current root children = all leaves; inter-cluster weights
    cross: Dict[int, Dict[int, float]] = {i: {} for i in range(num_nodes)}
    coo = A.tocoo()
    for u, v, w in zip(coo.row, coo.col, coo.data):
        if u < v:
            cross[u][v] = cross[u].get(v, 0.0) + w
            cross[v][u] = cross[v].get(u, 0.0) + w

    alive = set(range(num_nodes))

    def merge_delta(a, b, w_ab):
        na, nb = nodes[a], nodes[b]
        vol_m = na.vol + nb.vol
        if vol_m <= 0:
            return -math.inf
        g_m = na.cut + nb.cut - 2 * w_ab
        before = 0.0
        after = 0.0
        for n in (na, nb):
            if n.vol > 0:
                before += -(n.cut / V) * math.log2(max(n.vol / V, 1e-12))
                after += -(n.cut / V) * math.log2(max(n.vol / vol_m, 1e-12))
        after += -(g_m / V) * math.log2(max(vol_m / V, 1e-12))
        return before - after  # entropy decrease (maximize)

    heap = []
    for a in alive:
        for b, w in cross[a].items():
            if a < b:
                d = merge_delta(a, b, w)
                heapq.heappush(heap, (-d, a, b))

    # --- merge phase: binary agglomeration while entropy decreases -------
    while heap:
        negd, a, b = heapq.heappop(heap)
        if a not in alive or b not in alive:
            continue
        w_ab = cross[a].get(b, 0.0)
        d = merge_delta(a, b, w_ab)
        if d <= 1e-12:
            # stale entry? re-check freshness: if the recomputed delta is
            # non-positive for the BEST pair, stop
            if -negd - d > 1e-9:  # stale, push back the fresh value
                if d > 1e-12:
                    heapq.heappush(heap, (-d, a, b))
                continue
            break
        m = next_id
        next_id += 1
        na, nb = nodes[a], nodes[b]
        nm = _Node(m, vol=na.vol + nb.vol, cut=na.cut + nb.cut - 2 * w_ab)
        nm.children = [a, b]
        nm.leaves = na.leaves + nb.leaves
        na.parent = m
        nb.parent = m
        nodes[m] = nm
        alive.discard(a)
        alive.discard(b)
        # merge cross rows
        row: Dict[int, float] = {}
        for src in (a, b):
            for c, w in cross[src].items():
                if c in alive:
                    row[c] = row.get(c, 0.0) + w
        cross[m] = row
        for c, w in row.items():
            cross[c].pop(a, None)
            cross[c].pop(b, None)
            cross[c][m] = w
            d2 = merge_delta(m, c, w)
            if d2 > 0:
                aa, bb = (m, c) if m < c else (c, m)
                heapq.heappush(heap, (-d2, aa, bb))
        alive.add(m)

    # root over remaining
    root = next_id
    nroot = _Node(root, vol=V, cut=0.0)
    nroot.children = sorted(alive)
    for c in alive:
        nodes[c].parent = root
    nroot.leaves = list(range(num_nodes))
    nodes[root] = nroot

    # --- compress phase: bound the tree height --------------------------
    def height(nid):
        n = nodes[nid]
        if not n.children:
            return 0
        return 1 + max(height(c) for c in n.children)

    def removal_cost(nid):
        n = nodes[nid]
        p = nodes[n.parent]
        cost = (n.cut / V) * math.log2(max(n.vol / p.vol, 1e-12))
        for c in n.children:
            nc = nodes[c]
            if nc.vol > 0:
                cost += -(nc.cut / V) * (
                    math.log2(max(nc.vol / p.vol, 1e-12))
                    - math.log2(max(nc.vol / n.vol, 1e-12)))
        return -cost  # entropy increase when removed (minimize)

    while height(root) > max_height:
        # candidates: internal non-root nodes whose children are internal or
        # at max depth — simply all internal non-root nodes
        cands = [nid for nid, n in nodes.items()
                 if n.children and nid != root and n.parent is not None]
        if not cands:
            break
        best = min(cands, key=removal_cost)
        n = nodes[best]
        p = nodes[n.parent]
        p.children.remove(best)
        for c in n.children:
            nodes[c].parent = p.id
            p.children.append(c)
        del nodes[best]

    return nodes, root


def _sep_coding_tree_native(edge_index, num_nodes, edge_weight, max_height):
    from tgp_tpu._native import native_sep_merge

    # symmetrize like the Python path
    A = to_csr(edge_index, num_nodes, edge_weight)
    A = A.maximum(A.T).tocoo()
    ei = np.stack([A.row, A.col]).astype(np.int64)
    parent, vol, cut, n_total = native_sep_merge(ei, num_nodes, A.data)

    nodes = {}
    V = max(float(vol[:num_nodes].sum()), 1.0)
    for i in range(n_total):
        nd = _Node(i, vol=float(vol[i]), cut=float(cut[i]))
        nodes[i] = nd
    for i in range(n_total):
        p = int(parent[i])
        if p >= 0:
            nodes[p].children.append(i)
            nodes[i].parent = p
    # leaves bottom-up
    for i in range(num_nodes):
        nodes[i].leaves = [i]
    for i in range(num_nodes, n_total):
        nodes[i].leaves = [l for c in nodes[i].children
                           for l in nodes[c].leaves]
    root = n_total
    nroot = _Node(root, vol=V, cut=0.0)
    nroot.children = sorted(i for i in range(n_total)
                            if nodes[i].parent is None)
    for c in nroot.children:
        nodes[c].parent = root
    nroot.leaves = list(range(num_nodes))
    nodes[root] = nroot

    # height compression (same as the Python path)
    def height(nid):
        n = nodes[nid]
        if not n.children:
            return 0
        return 1 + max(height(c) for c in n.children)

    def removal_cost(nid):
        n = nodes[nid]
        p = nodes[n.parent]
        cost = (n.cut / V) * math.log2(max(n.vol / p.vol, 1e-12))
        for c in n.children:
            nc = nodes[c]
            if nc.vol > 0:
                cost += -(nc.cut / V) * (
                    math.log2(max(nc.vol / p.vol, 1e-12))
                    - math.log2(max(nc.vol / n.vol, 1e-12)))
        return -cost

    while height(root) > max_height:
        cands = [nid for nid, n in nodes.items()
                 if n.children and nid != root and n.parent is not None]
        if not cands:
            break
        best = min(cands, key=removal_cost)
        n = nodes[best]
        p = nodes[n.parent]
        p.children.remove(best)
        for c in n.children:
            nodes[c].parent = p.id
            p.children.append(c)
        del nodes[best]
    return nodes, root


def sep_levels(edge_index, num_nodes, edge_weight=None, *,
               levels: int = 1, max_height: Optional[int] = None) -> list:
    """Derive ``levels`` hard partitions from one coding tree (coarse→fine
    rollout: level ℓ uses the tree layer at depth ``levels−ℓ`` … the finest
    usable layer first, like the reference's multi-level SEP)."""
    if max_height is None:
        max_height = levels + 1
    nodes, root = sep_coding_tree(edge_index, num_nodes, edge_weight,
                                  max_height=max_height)

    # depth-ℓ partition: cluster = ancestor at depth ℓ (or self if shallower)
    def layer_partition(depth_target):
        part = np.zeros(num_nodes, np.int64)
        cid = 0
        def walk(nid, depth):
            nonlocal cid
            n = nodes[nid]
            if depth == depth_target or not n.children:
                for leaf in n.leaves:
                    part[leaf] = cid
                cid += 1
                return
            for c in n.children:
                walk(c, depth + 1)
        walk(root, 0)
        return part, cid

    ei = np.asarray(edge_index)
    w = (np.ones(ei.shape[1], np.float32) if edge_weight is None
         else np.asarray(edge_weight, np.float32))

    out = []
    prev_cluster = None
    cur_ei, cur_w, cur_n = ei, w, num_nodes
    # deepest internal layer (just above leaves) first, going coarser
    depths = list(range(1, max_height + 1))[::-1][:levels]
    # finest partition = largest depth
    for depth in depths[:levels]:
        part, k = layer_partition(depth)
        if prev_cluster is None:
            level_assign = part
        else:
            # map previous level's clusters through this layer: every
            # previous cluster is contained in one node of the coarser layer
            level_assign = np.zeros(prev_k, np.int64)
            for node_idx in range(num_nodes):
                level_assign[prev_cluster[node_idx]] = part[node_idx]
        pooled = np.stack([level_assign[cur_ei[0]], level_assign[cur_ei[1]]])
        keep = pooled[0] != pooled[1]
        if keep.any():
            ei_pool, ew_pool = coalesce_numpy(pooled[:, keep], cur_w[keep],
                                              max(k, 1))
        else:
            ei_pool = np.zeros((2, 0), np.int64)
            ew_pool = np.zeros(0, np.float32)
        out.append({
            "kind": "sparse",
            "cluster_index": level_assign,
            "weight": np.ones(cur_n, np.float32),
            "num_clusters": k,
            "edge_index": ei_pool,
            "edge_weight": ew_pool.astype(np.float32),
            "partial": False,
        })
        prev_cluster = part
        prev_k = k
        cur_ei, cur_w, cur_n = ei_pool, ew_pool.astype(np.float32), k
    return out
