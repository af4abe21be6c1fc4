"""Seeded random-graph generators for tests (analogue of the reference's
tests/test_utils.py:1-100 chain/ER/BA/grid generators)."""

from __future__ import annotations

import numpy as np

from tgp_tpu.graph import from_graphs


def chain_graph(n: int, num_features: int = 4, seed: int = 0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, num_features)).astype(np.float32)
    src = np.arange(n - 1)
    ei = np.stack([np.concatenate([src, src + 1]),
                   np.concatenate([src + 1, src])])
    return x, ei


def erdos_renyi_graph(n: int, p: float = 0.3, num_features: int = 4, seed: int = 0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, num_features)).astype(np.float32)
    upper = rng.random((n, n)) < p
    upper = np.triu(upper, k=1)
    adj = upper | upper.T
    s, r = np.nonzero(adj)
    ei = np.stack([s, r])
    if ei.shape[1] == 0:  # guarantee at least one edge
        ei = np.array([[0], [min(1, n - 1)]])
        ei = np.concatenate([ei, ei[::-1]], axis=1)
    return x, ei


def grid_graph(rows: int, cols: int, num_features: int = 4, seed: int = 0):
    rng = np.random.default_rng(seed)
    n = rows * cols
    x = rng.normal(size=(n, num_features)).astype(np.float32)
    edges = []
    for i in range(rows):
        for j in range(cols):
            u = i * cols + j
            if j + 1 < cols:
                edges += [(u, u + 1), (u + 1, u)]
            if i + 1 < rows:
                edges += [(u, u + cols), (u + cols, u)]
    ei = np.array(edges).T
    return x, ei


def make_batch(sizes, num_features=4, p=0.4, seed=0, pad_nodes=None, pad_edges=None,
               weighted=False):
    graphs = []
    for i, n in enumerate(sizes):
        x, ei = erdos_renyi_graph(n, p=p, num_features=num_features, seed=seed + i)
        if weighted:
            rng = np.random.default_rng(seed + 100 + i)
            ew = rng.uniform(0.5, 2.0, size=ei.shape[1]).astype(np.float32)
            graphs.append((x, ei, ew))
        else:
            graphs.append((x, ei))
    return from_graphs(graphs, pad_nodes=pad_nodes, pad_edges=pad_edges)
