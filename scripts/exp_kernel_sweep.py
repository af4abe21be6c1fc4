"""Block-size sweep for the sorted-CSR Pallas segment-sum kernel.

The round-2 honest numbers put the full SpMM pipeline at ~155-160 GB/s
effective vs ~820 GB/s HBM peak.  The kernel leg (read [E,F] msgs
sequentially, write [N,F]) should stream near peak but was only ever run at
block_rows=128 / block_edges=512.  Sweep both, plus measure the gather leg
and kernel leg separately so we know which leg holds the pipeline back.
"""

import itertools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from tgp_tpu.ops.pallas.segment_spmm import sorted_segment_sum_pallas

ITERS = 30


def chain(fn, x0, iters=ITERS):
    def body(i, acc):
        out = fn(acc)
        scale = jax.lax.rsqrt(jnp.mean(out.astype(jnp.float32) ** 2) + 1e-12)
        return out * scale.astype(out.dtype)

    return jax.lax.fori_loop(0, iters, body, x0)


def timed(f, *args):
    float(f(*args))
    t0 = time.perf_counter(); float(f(*args))
    t_one = time.perf_counter() - t0
    t0 = time.perf_counter()
    outs = [f(*args) for _ in range(4)]
    float(outs[-1])
    t_four = time.perf_counter() - t0
    return max(t_four - t_one, 1e-9) / (3 * ITERS)


def run(N=65536, E=1048576, F=128, dtype=jnp.bfloat16):
    rng = np.random.default_rng(0)
    rids = np.sort(rng.integers(0, N, E).astype(np.int32))
    s_sorted = rng.integers(0, N, E).astype(np.int32)
    w = rng.normal(size=E).astype(np.float32)
    rp = jnp.asarray(np.searchsorted(rids, np.arange(N + 1)).astype(np.int32))
    rj = jnp.asarray(rids)
    sj = jnp.asarray(s_sorted)
    wj = jnp.asarray(w).astype(dtype)
    xj = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32)).astype(dtype)
    msgs0 = (xj[sj] * wj[:, None])
    bytes_per = 2 if dtype == jnp.bfloat16 else 4
    label = "bf16" if dtype == jnp.bfloat16 else "f32"

    # --- leg A: gather+weight only (chained through a row-slice reduce so
    # the [E,F] output feeds the next iteration's [N,F] input)
    def gather_leg(h):
        m = h[sj] * wj[:, None]
        return m[:N]  # slice, no reduction cost

    f = jax.jit(lambda x0: jnp.sum(chain(gather_leg, x0).astype(jnp.float32)))
    dt = timed(f, xj)
    tr = E * F * bytes_per * 2 / dt / 1e9
    print(f"{label} gather leg : {dt*1e3:7.3f} ms  {tr:6.0f} GB/s", flush=True)

    # --- leg B: kernel only (fixed msgs, chain through scaling out)
    for br, be in itertools.product((128, 256, 512), (512, 1024, 2048)):
        def kernel_leg(m):
            return sorted_segment_sum_pallas(
                m, rj, rp, N, block_rows=br, block_edges=be)

        def step(i, acc):
            out = kernel_leg(msgs0 * acc[0, 0])
            s = jax.lax.rsqrt(jnp.mean(out.astype(jnp.float32) ** 2) + 1e-12)
            return acc * 0 + s.astype(acc.dtype)

        f = jax.jit(lambda a0: jnp.sum(
            jax.lax.fori_loop(0, ITERS, step, a0).astype(jnp.float32)))
        try:
            dt = timed(f, jnp.ones((8, 128), dtype))
        except Exception as ex:  # VMEM overflow etc.
            print(f"{label} kernel br={br:3d} be={be:4d}: FAIL "
                  f"{type(ex).__name__}", flush=True)
            continue
        # NOTE: the step also re-reads msgs0 and writes [E,F] for the scale
        # multiply — count that traffic so the GB/s is honest
        traffic = (E * F * bytes_per * 3  # scale-mul read+write, kernel read
                   + N * F * bytes_per)
        print(f"{label} kernel br={br:3d} be={be:4d}: {dt*1e3:7.3f} ms  "
              f"{traffic/dt/1e9:6.0f} GB/s(incl. premul)", flush=True)

    # --- full pipeline at best params vs default
    for br, be in ((128, 512), (256, 1024), (512, 2048), (256, 2048)):
        def full(h):
            return sorted_segment_sum_pallas(
                h[sj] * wj[:, None], rj, rp, N, block_rows=br, block_edges=be)

        f = jax.jit(lambda x0: jnp.sum(chain(full, x0).astype(jnp.float32)))
        try:
            dt = timed(f, xj)
        except Exception as ex:
            print(f"{label} full  br={br:3d} be={be:4d}: FAIL "
                  f"{type(ex).__name__}", flush=True)
            continue
        traffic = E * F * bytes_per * 3 + N * F * bytes_per
        print(f"{label} full  br={br:3d} be={be:4d}: {dt*1e3:7.3f} ms  "
              f"{E/dt/1e9:5.2f} Gedge/s  {traffic/dt/1e9:6.0f} GB/s",
              flush=True)


if __name__ == "__main__":
    run(dtype=jnp.bfloat16)
    run(dtype=jnp.float32)
