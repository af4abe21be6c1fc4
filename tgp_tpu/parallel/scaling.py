"""Scaling-efficiency harness: edges/s of the sharded pooled forward vs
device count (BASELINE.md's "≥80% edges/s scaling efficiency at 2 hosts"
metric).

On real multi-chip hardware this measures ICI/DCN scaling directly; on the
virtual CPU mesh (this image has one real TPU chip) it validates the
measurement machinery and the sharding compiles/executes at every device
count — wall-clock numbers from virtual devices are NOT hardware numbers.
"""

from __future__ import annotations

import time
from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tgp_tpu.parallel.pooled_model import (
    init_pooled_params,
    make_sharded_pooled_forward,
    prepare_sharded_graph,
)

__all__ = ["measure_pooled_scaling"]


def _random_regular_graph(n: int, degree: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    senders = np.repeat(np.arange(n), degree)
    receivers = rng.integers(0, n, senders.shape[0])
    keep = senders != receivers
    s, r = senders[keep], receivers[keep]
    return (np.concatenate([s, r]).astype(np.int64),
            np.concatenate([r, s]).astype(np.int64))


def measure_pooled_scaling(
    n_nodes: int = 1 << 16,
    n_feats: int = 64,
    degree: int = 8,
    hidden: int = 64,
    device_counts: Sequence[int] = (1, 2, 4, 8),
    iters: int = 10,
    seed: int = 0,
) -> Dict[int, dict]:
    """Run the sharded GCN→pool→GCN forward at each device count on the same
    graph; returns ``{D: {edges_per_s, seconds_per_step, efficiency}}`` with
    efficiency relative to the 1-device throughput (ideal = 1.0 at every D)."""
    s_np, r_np = _random_regular_graph(n_nodes, degree, seed)
    n_edges = s_np.shape[0]
    x_np = np.random.default_rng(seed + 1).normal(
        size=(n_nodes, n_feats)).astype(np.float32)

    results: Dict[int, dict] = {}
    base = None
    for D in device_counts:
        devs = jax.devices()[:D]
        if len(devs) < D:
            continue
        mesh = Mesh(np.array(devs), ("gp",))
        S, R, W, n_pad, rows_per = prepare_sharded_graph(
            s_np, r_np, None, n_nodes, D)
        x = np.zeros((n_pad, n_feats), np.float32)
        x[:n_nodes] = x_np
        params = init_pooled_params(jax.random.key(0), n_feats, hidden, 3)
        fwd, _ = make_sharded_pooled_forward(
            mesh, rows_per=rows_per, n_pad=n_pad, num_valid=n_nodes,
            ratio=0.5)
        shard = NamedSharding(mesh, P("gp"))
        args = (params, jax.device_put(jnp.asarray(x), shard),
                jax.device_put(S, shard), jax.device_put(R, shard),
                jax.device_put(W, shard))
        logits, _ = fwd(*args)  # compile
        float(jnp.sum(logits))  # device-to-host sync (see note below)
        t0 = time.perf_counter()
        for _ in range(iters):
            logits, h = fwd(*args)
        # sync via a host transfer, NOT block_until_ready: on the axon TPU
        # backend block_until_ready returns at dispatch, so timings would
        # measure queueing only (same workaround as scripts/bench_kernels.py
        # and examples/time_and_mem_test.py)
        float(jnp.sum(logits))
        dt = (time.perf_counter() - t0) / iters
        eps = n_edges / dt
        if base is None:
            base = eps
        results[D] = {
            "edges_per_s": eps,
            "seconds_per_step": dt,
            "efficiency": eps / (base * (D / device_counts[0])),
        }
    return results
