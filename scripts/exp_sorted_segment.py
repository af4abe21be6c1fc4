"""TPU scatter cost anatomy: segment_min/sum with random vs sorted ids
(indices_are_sorted), and a one-hot-matmul alternative, at the matching-loop
scale (2E=25.6k updates into N=1600 segments)."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

REPS = 30
N, E2 = 1600, 25600


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


def main():
    rng = np.random.default_rng(0)
    ids = rng.integers(0, N, E2).astype(np.int32)
    ids_sorted = np.sort(ids)
    vals = rng.random(E2).astype(np.float32)
    idr = jnp.asarray(ids)
    idss = jnp.asarray(ids_sorted)
    v = jnp.asarray(vals)

    dt = timed(lambda x: jax.ops.segment_min(x, idr, num_segments=N), v)
    print(f"segmin_random      {dt*1e6:9.1f} µs", flush=True)
    dt = timed(lambda x: jax.ops.segment_min(
        x, idss, num_segments=N, indices_are_sorted=True), v)
    print(f"segmin_sorted      {dt*1e6:9.1f} µs", flush=True)
    dt = timed(lambda x: jax.ops.segment_sum(x, idr, num_segments=N), v)
    print(f"segsum_random      {dt*1e6:9.1f} µs", flush=True)
    dt = timed(lambda x: jax.ops.segment_sum(
        x, idss, num_segments=N, indices_are_sorted=True), v)
    print(f"segsum_sorted      {dt*1e6:9.1f} µs", flush=True)

    # feature-vectorized scatter for comparison (the SpMM shape)
    vf = jnp.asarray(rng.random((E2, 128)).astype(np.float32))
    dt = timed(lambda x: jax.ops.segment_sum(x, idr, num_segments=N), vf)
    print(f"segsum_rand_F128   {dt*1e6:9.1f} µs", flush=True)

    # one-hot matmul min substitute: min via -max(-x); max via segment
    # one-hot? true matmul can't do min — measure a one-hot SUM instead
    # (for matched_node |= and degree-style counts)
    P = jax.nn.one_hot(idr, N, dtype=jnp.float32)  # [E2, N] — 164 MB! skip
    # instead: sort-based segmented reduce via associative_scan
    def seg_min_scan(x):
        # segmented min over sorted ids via associative scan
        def comb(a, b):
            va, ia = a
            vb, ib = b
            same = ia == ib
            return jnp.where(same, jnp.minimum(va, vb), vb), ib
        vs, _ = jax.lax.associative_scan(comb, (x, idss))
        # last element of each segment = boundary
        nxt = jnp.concatenate([idss[1:], jnp.full(1, N, jnp.int32)])
        is_last = nxt != idss
        out = jnp.full(N, jnp.inf).at[jnp.where(is_last, idss, N - 1)].min(
            jnp.where(is_last, vs, jnp.inf))
        return out

    dt = timed(seg_min_scan, v)
    print(f"segmin_scan_sorted {dt*1e6:9.1f} µs (incl. boundary scatter)",
          flush=True)


if __name__ == "__main__":
    main()
