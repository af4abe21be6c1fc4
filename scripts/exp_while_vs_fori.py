"""Is lax.while_loop paying a per-iteration sync on the axon backend?
Compare the matching loop as while_loop vs fixed-count fori_loop (plus a
hybrid fori+while finisher) at the RESULTS scale."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from tests.utils_graphs import make_batch
from tgp_tpu.ops.segment import segment_min, segment_sum

REPS = 20


def timed(fn, *args):
    jfn = jax.jit(fn)
    jax.block_until_ready(jfn(*args))
    t0 = time.perf_counter()
    jax.block_until_ready(jfn(*args))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    outs = [jfn(*args) for _ in range(REPS)]
    jax.block_until_ready(outs)
    tm = time.perf_counter() - t0
    return (tm - t1) / (REPS - 1)


def matching_body(state, rank, senders, receivers, num_nodes, BIG):
    match, active = state
    r_act = jnp.where(active, rank, BIG)
    both_idx = jnp.concatenate([senders, receivers])
    both_rank = jnp.concatenate([r_act, r_act])
    node_min = segment_min(both_rank, both_idx, num_nodes)
    edge_min = jnp.minimum(node_min[senders], node_min[receivers])
    new_match = match | (active & (rank == edge_min))
    matched_node = segment_sum(
        jnp.concatenate([new_match, new_match]).astype(jnp.int32),
        both_idx, num_nodes) > 0
    active2 = active & ~matched_node[senders] & ~matched_node[receivers]
    return new_match, active2


def main():
    batch = make_batch([200] * 8, num_features=4, p=0.04, seed=0,
                       weighted=True)
    E, N = batch.num_edges, batch.num_nodes
    s, r, em = batch.senders, batch.receivers, batch.edge_mask
    w = batch.edge_weight
    order = jnp.lexsort((-w, ~em))
    rank = jnp.zeros(E, jnp.int32).at[order].set(
        jnp.arange(E, dtype=jnp.int32))
    BIG = jnp.int32(E + 1)

    def match_while(rank):
        def cond(st):
            return jnp.any(st[1])

        def body(st):
            return matching_body(st, rank, s, r, N, BIG)

        m, _ = jax.lax.while_loop(cond, body, (jnp.zeros(E, bool), em))
        return m

    def match_fori(rank, R=10):
        def body(_, st):
            return matching_body(st, rank, s, r, N, BIG)

        m, _ = jax.lax.fori_loop(0, R, body, (jnp.zeros(E, bool), em))
        return m

    def match_hybrid(rank):
        def body(_, st):
            return matching_body(st, rank, s, r, N, BIG)

        st = jax.lax.fori_loop(0, 8, body, (jnp.zeros(E, bool), em))

        def cond(s_):
            return jnp.any(s_[1])

        m, _ = jax.lax.while_loop(
            cond, lambda s_: matching_body(s_, rank, s, r, N, BIG), st)
        return m

    mw = match_while(rank)
    mf = match_fori(rank)
    mh = match_hybrid(rank)
    assert bool(jnp.all(mw == mf)), "fori(10) != while result"
    assert bool(jnp.all(mw == mh)), "hybrid != while result"

    for name, fn in (("while", match_while), ("fori10", match_fori),
                     ("hybrid", match_hybrid)):
        dt = timed(fn, rank)
        print(f"{name:8s} {dt*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
