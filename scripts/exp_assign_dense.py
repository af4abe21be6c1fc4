"""Timing: assign_all_nodes sparse (lexsort voting) vs dense (one-hot matmul
voting) at the RESULTS scale (8x200 nodes), plus the maxcut pooler end-to-end
with each engine."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from tests.utils_graphs import make_batch
from tgp_tpu.ops.assignment import assign_all_nodes
from tgp_tpu.select.base import cluster_to_select_output
from tgp_tpu.poolers import get_pooler

REPS = 20


def timed(fn, *args):
    jfn = jax.jit(fn)
    t0 = time.perf_counter()
    jax.block_until_ready(jfn(*args))
    comp = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.block_until_ready(jfn(*args))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    outs = [jfn(*args) for _ in range(REPS)]
    jax.block_until_ready(outs)
    tm = time.perf_counter() - t0
    return (tm - t1) / (REPS - 1), comp


def main():
    batch = make_batch([200] * 8, num_features=16, p=0.04, seed=0,
                       weighted=True)
    N = batch.num_nodes
    rng = np.random.default_rng(0)
    nm = np.asarray(batch.node_mask)
    sel = nm & (rng.random(N) < 0.5)
    ci = np.where(sel, np.arange(N), 0).astype(np.int64)
    so = cluster_to_select_output(
        jnp.asarray(ci), batch, node_sel_mask=jnp.asarray(sel),
        num_clusters=N, max_clusters=batch.max_nodes, partial=True)

    for impl in ("sparse", "dense"):
        def assign(so, b, impl=impl):
            return assign_all_nodes(
                so, b.senders, b.receivers, b.edge_mask, max_iter=5,
                node_pos=b.node_pos, max_nodes=b.max_nodes,
                impl=impl).cluster_index
        dt, comp = timed(assign, so, batch)
        print(f"assign[{impl:6s}]   {dt*1e3:7.3f} ms (compile {comp:.0f}s)",
              flush=True)

    for impl in ("sparse", "dense"):
        pooler = get_pooler("maxcut", in_channels=16, ratio=0.5,
                            mp_impl=impl)
        params = pooler.init(jax.random.key(0), batch)

        def fwd(params, b):
            out = pooler.apply(params, b)
            return out.x, out.so.cluster_index
        dt, comp = timed(fwd, params, batch)
        print(f"maxcut[{impl:6s}]   {dt*1e3:7.3f} ms (compile {comp:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
