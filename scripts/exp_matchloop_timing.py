"""Component timing for the while-loop poolers (VERDICT weak #7): where do
ec/graclus/maxcut's ~10-13 ms go at the RESULTS scale (8×200 nodes,
E≈12.8k)?  Times each component as ONE jitted program via the async-queue
method."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from tests.utils_graphs import make_batch
from tgp_tpu.select.edge_contraction import maximal_matching
from tgp_tpu.select.graclus import graclus_select
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
    E = batch.num_edges
    N = batch.num_nodes
    print(f"N={N} E={E} real_edges={int(np.asarray(batch.edge_mask).sum())}",
          flush=True)
    s, r, em = batch.senders, batch.receivers, batch.edge_mask
    w = batch.edge_weight

    def ranks(w):
        order = jnp.lexsort((-w, ~em))
        return jnp.zeros(E, jnp.int32).at[order].set(
            jnp.arange(E, dtype=jnp.int32))

    dt, comp = timed(ranks, w)
    print(f"lexsort+rank      {dt*1e3:7.3f} ms (compile {comp:.0f}s)",
          flush=True)

    rank = ranks(w)
    dt, comp = timed(lambda rk: maximal_matching(rk, s, r, em, N), rank)
    print(f"matching(while)   {dt*1e3:7.3f} ms (compile {comp:.0f}s)",
          flush=True)

    dt, comp = timed(lambda b: graclus_select(b).cluster_index, batch)
    print(f"graclus_select    {dt*1e3:7.3f} ms (compile {comp:.0f}s)",
          flush=True)

    pooler = get_pooler("graclus")
    dt, comp = timed(lambda b: pooler(b).graph.x, batch)
    print(f"graclus pooler    {dt*1e3:7.3f} ms (compile {comp:.0f}s)",
          flush=True)

    ec = get_pooler("ec", in_channels=16)
    params = ec.init(jax.random.key(0), batch)
    dt, comp = timed(lambda p, b: ec.apply(p, b).graph.x, params, batch)
    print(f"ec pooler         {dt*1e3:7.3f} ms (compile {comp:.0f}s)",
          flush=True)

    # connect step alone (the masked static-budget coalesce)
    from tgp_tpu.connect.base import ConnectConfig, sparse_connect

    so = graclus_select(batch)
    dt, comp = timed(
        lambda b: sparse_connect(b.senders, b.receivers, b.edge_weight,
                                 b.edge_mask, so, ConnectConfig())[2], batch)
    print(f"sparse_connect    {dt*1e3:7.3f} ms (compile {comp:.0f}s)",
          flush=True)


if __name__ == "__main__":
    main()
