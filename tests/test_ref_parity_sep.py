"""SEP coding-tree parity vs the reference's OWN PartitionTree (VERDICT r2
#4b): the reference tree optimizer (tgp/select/sep_select.py:542-1271) is
pure numpy+math+heapq, so its torch-free defs are ast-extracted and exec'd
directly as a true oracle.  Tie-breaking between the two heap
agglomerations may legitimately differ, so the quantified bound is
STRUCTURAL ENTROPY: on ≥20 seeded graphs our depth-1 partition's two-level
structural entropy must match the reference partition's within 5%% relative
(both minimize the same objective), and cluster counts must be close.

Skipped when /root/reference is not mounted."""

from __future__ import annotations

import ast
import math
from pathlib import Path

import numpy as np
import pytest

_REF = Path("/root/reference/tgp/select/sep_select.py")

_TREE_DEFS = {
    "_connected_components_undirected", "_adj_mat_to_coding_tree",
    "_trans_to_tree", "_update_depth", "_update_node", "_id_generator",
    "_graph_parse", "_cut_volume", "_layer_first", "_merge_nodes",
    "_compress_node", "_child_tree_depth", "_compress_delta",
    "_combine_delta", "PartitionTreeNode", "PartitionTree",
}


@pytest.fixture(scope="module")
def ref_sep():
    if not _REF.exists():
        pytest.skip("reference repo not mounted")
    import heapq
    import itertools
    from dataclasses import dataclass
    from typing import Optional

    src = _REF.read_text()
    tree = ast.parse(src)

    def seg(n):
        # get_source_segment omits decorators — re-attach them (@dataclass)
        decos = "".join(f"@{ast.get_source_segment(src, d)}\n"
                        for d in n.decorator_list)
        return decos + ast.get_source_segment(src, n)

    pieces = [seg(n) for n in tree.body
              if isinstance(n, (ast.FunctionDef, ast.ClassDef))
              and n.name in _TREE_DEFS]
    assert len(pieces) == len(_TREE_DEFS), "reference defs moved"
    # a REAL registered module: @dataclass introspects sys.modules[__module__]
    import sys
    import types

    mod = types.ModuleType("ref_sep_oracle")
    mod.__dict__.update({"heapq": heapq, "itertools": itertools,
                         "math": math, "dataclass": dataclass,
                         "Optional": Optional, "np": np})
    sys.modules["ref_sep_oracle"] = mod
    exec(compile("\n\n".join(pieces), str(_REF), "exec"), mod.__dict__)
    return mod.__dict__


def _depth_one_partition(tree_nodes, num_nodes):
    """NumPy transcription of the reference's ``_depth_one_assignment``
    (sep_select.py:419-453): depth-1 nodes by ascending id, children →
    cluster; uncovered nodes become singletons."""
    assignment = np.full(num_nodes, -1, np.int64)
    cid = 0
    for node_id in sorted(tree_nodes.keys()):
        node = tree_nodes[node_id]
        if node["depth"] != 1:
            continue
        children = node.get("children") or []
        if not children:
            continue
        leaves = [tree_nodes[c].get("graphID", c) for c in children]
        assignment[leaves] = cid
        cid += 1
    missing = np.nonzero(assignment < 0)[0]
    if missing.size:
        assignment[missing] = np.arange(cid, cid + missing.size)
    return assignment


def _struct_entropy(adj, part):
    """Two-level structural entropy of a flat partition (Li & Pan 2016):
    H = Σ_c [ −(g_c/V)·log2(vol_c/V) + Σ_{v∈c} −(d_v/V)·log2(d_v/vol_c) ]."""
    deg = adj.sum(1)
    V = deg.sum()
    H = 0.0
    for c in np.unique(part):
        mem = part == c
        vol_c = deg[mem].sum()
        if vol_c <= 0:
            continue
        g_c = adj[np.ix_(mem, ~mem)].sum()
        H += -(g_c / V) * math.log2(vol_c / V) if vol_c < V else 0.0
        d = deg[mem]
        d = d[d > 0]
        H += float(np.sum(-(d / V) * np.log2(d / vol_c)))
    return H


def _er_graph(n, p, seed):
    rng = np.random.default_rng(seed)
    upper = np.triu(rng.random((n, n)) < p, k=1)
    adj = (upper | upper.T).astype(np.float64)
    s, r = np.nonzero(adj)
    return adj, np.stack([s, r]).astype(np.int64)


@pytest.mark.parametrize("seed", range(20))
def test_sep_depth1_entropy_within_reference(ref_sep, seed):
    from tgp_tpu.precoarsen.sep import sep_levels

    n = int(10 + (seed * 7) % 15)
    adj, ei = _er_graph(n, 0.3, seed)
    if ei.shape[1] == 0:
        pytest.skip("empty graph draw")

    tree_nodes = ref_sep["_adj_mat_to_coding_tree"](adj, tree_depth=2)
    ref_part = _depth_one_partition(tree_nodes, n)
    mine = sep_levels(ei, n, levels=1)[0]
    my_part = np.asarray(mine["cluster_index"])

    h_ref = _struct_entropy(adj, ref_part)
    h_mine = _struct_entropy(adj, my_part)
    scale = max(abs(h_ref), 1e-9)
    # one-sided: the exact antichain DP (tgp_tpu/precoarsen/sep.py) must
    # MATCH OR BEAT the reference's greedy optimizer on its own objective
    assert (h_mine - h_ref) / scale < 0.05, (
        f"seed {seed}: entropy mine={h_mine:.4f} ref={h_ref:.4f}")
    # cluster counts in the same ballpark (same objective, different ties).
    # When our DP finds a strictly better optimum a different k is
    # legitimate — then only sanity-check non-degeneracy.
    k_ref = len(np.unique(ref_part))
    k_mine = int(mine["num_clusters"])
    if h_mine >= h_ref - 0.02 * scale:
        assert abs(k_mine - k_ref) <= max(2, int(0.3 * k_ref) + 1), (
            f"seed {seed}: k mine={k_mine} ref={k_ref}")
    else:
        assert 1 <= k_mine < n, f"seed {seed}: degenerate k={k_mine}"


def test_sep_multilevel_entropy_within_reference(ref_sep):
    """2-level rollout: flat node partitions at depth 1 and 2 of the
    reference tree vs our level compositions, entropy within 7%."""
    from tgp_tpu.precoarsen.sep import sep_levels

    for seed in range(6):
        n = 18 + seed
        adj, ei = _er_graph(n, 0.25, 100 + seed)
        if ei.shape[1] == 0:
            continue
        tree_nodes = ref_sep["_adj_mat_to_coding_tree"](adj, tree_depth=3)

        # reference flat partition at each depth (ancestor's id at depth d)
        def ref_depth_partition(d):
            part = np.zeros(n, np.int64)
            for v in range(n):
                node = tree_nodes[v]
                while node["depth"] < d and node["parent"] is not None:
                    node = tree_nodes[node["parent"]]
                part[v] = node["ID"]
            _, part = np.unique(part, return_inverse=True)
            return part

        levels = sep_levels(ei, n, levels=2)
        mine_flat = np.asarray(levels[0]["cluster_index"])
        comp = np.asarray(levels[1]["cluster_index"])[mine_flat]
        for d, my_part in ((1, mine_flat), (2, comp)):
            h_ref = _struct_entropy(adj, ref_depth_partition(d))
            h_mine = _struct_entropy(adj, my_part)
            scale = max(abs(h_ref), 1e-9)
            # one-sided: match or beat the greedy reference optimizer
            assert (h_mine - h_ref) / scale < 0.07, (
                f"seed {seed} depth {d}: mine={h_mine:.4f} ref={h_ref:.4f}")
