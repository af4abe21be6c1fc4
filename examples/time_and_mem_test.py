"""Per-pooler forward/backward timing harness (reference:
examples/time_and_mem_test.py:1-579 — its MemoryStats/BenchmarkResult
dataclasses become plain dicts; device memory from
``jax.local_devices()[0].memory_stats()``).

Run:  python examples/time_and_mem_test.py [sizes...]
Prints per-pooler forward/backward wall time over random ER batches.
"""

from __future__ import annotations

import sys
import time
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from tgp_tpu.data.loaders import GraphLoader
from tgp_tpu.datasets.synthetic import SyntheticGraphClassification
from tgp_tpu.poolers import get_pooler
from tests.utils_graphs import erdos_renyi_graph  # reuse seeded generator

POOLERS_TIMED = ["topk", "sag", "asap", "ec", "kmis", "graclus", "maxcut",
                 "mincut", "diff", "dmon", "hosc", "jb", "acc", "lap",
                 "nopool"]


@dataclass
class BenchmarkResult:
    pooler: str
    fwd_ms: float
    fwd_bwd_ms: float
    device_mem_mb: Optional[float]


def bench_pooler(alias, batch, iters=10):
    kw = dict(in_channels=batch.num_features, ratio=0.5, k=16)
    pooler = get_pooler(alias, **kw)
    rngs = {"params": jax.random.key(0)}
    if alias.startswith("bnpool"):
        rngs["sample"] = jax.random.key(1)
    params = pooler.init(rngs, batch)

    is_host = not hasattr(pooler, "bind")

    def fwd(p, b):
        out = pooler.apply(p, b)
        x = out.graph.x if out.graph is not None else out.dense.x
        return jnp.sum(x ** 2) + out.loss_sum()

    if is_host:
        t0 = time.perf_counter()
        for _ in range(iters):
            fwd(params, batch)
        fwd_ms = (time.perf_counter() - t0) / iters * 1e3
        return BenchmarkResult(alias, fwd_ms, float("nan"), None)

    # NOTE: on the axon backend ``block_until_ready`` is NOT an execution
    # barrier (scripts/exp_bench_timing.py) — sync through a device→host
    # scalar transfer instead.
    jfwd = jax.jit(fwd)
    jgrad = jax.jit(lambda p, b: jax.tree.reduce(
        lambda a, l: a + jnp.sum(l.astype(jnp.float32) ** 2),
        jax.grad(fwd)(p, b), jnp.float32(0)))
    float(jfwd(params, batch))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters - 1):
        jfwd(params, batch)
    float(jfwd(params, batch))
    fwd_ms = (time.perf_counter() - t0) / iters * 1e3

    float(jgrad(params, batch))
    t0 = time.perf_counter()
    for _ in range(iters - 1):
        jgrad(params, batch)
    float(jgrad(params, batch))
    bwd_ms = (time.perf_counter() - t0) / iters * 1e3

    stats = jax.local_devices()[0].memory_stats() or {}
    mem = stats.get("bytes_in_use")
    return BenchmarkResult(alias, fwd_ms, bwd_ms,
                           mem / 2**20 if mem else None)


def main(sizes=(50, 200), batch_size=4, num_features=16,
         profile_dir: str | None = None, poolers=None):
    """Set ``profile_dir`` (or pass ``--profile``) to capture a
    ``jax.profiler`` trace of the benchmark for xprof/tensorboard."""
    if profile_dir:
        jax.profiler.start_trace(profile_dir)
    for n in sizes:
        graphs = [erdos_renyi_graph(n, p=min(8.0 / n, 0.5),
                                    num_features=num_features, seed=i)
                  for i in range(batch_size)]
        loader = GraphLoader(graphs, batch_size=batch_size)
        batch = next(iter(loader))
        print(f"== N={n} x {batch_size} graphs "
              f"(E={int(np.asarray(batch.edge_mask).sum())}) ==", flush=True)
        for alias in poolers or POOLERS_TIMED:
            try:
                r = bench_pooler(alias, batch)
                mem = f" mem={r.device_mem_mb:.0f}MB" if r.device_mem_mb else ""
                print(f"  {alias:10s} fwd {r.fwd_ms:8.2f}ms  "
                      f"fwd+bwd {r.fwd_bwd_ms:8.2f}ms{mem}", flush=True)
            except Exception as exc:
                print(f"  {alias:10s} FAILED: {type(exc).__name__}: {exc}",
                      flush=True)
    if profile_dir:
        jax.profiler.stop_trace()
        print(f"profiler trace written to {profile_dir}")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    profile = "--profile" in sys.argv
    poolers = [a for a in args if not a.isdigit()] or None
    sizes = tuple(int(s) for s in args if s.isdigit()) or (50, 200)
    main(sizes, profile_dir="/tmp/tgp_profile" if profile else None,
         poolers=poolers)
