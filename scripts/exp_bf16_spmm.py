"""bf16-DATA sparse SpMM experiment: does halving the [E,F] gather/write
HBM traffic speed up the sorted-CSR pipeline?  (The earlier 'bf16' rows
only changed matmul precision, not the stored dtype.)"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from tgp_tpu.ops.pallas.segment_spmm import (sorted_segment_sum_grouped,
                                             sorted_segment_sum_pallas)

ITERS = 30


def chain(fn, x0, iters=ITERS):
    def body(i, acc):
        out = fn(acc)
        scale = jax.lax.rsqrt(jnp.mean(
            out.astype(jnp.float32) ** 2) + 1e-12)
        return (out * scale.astype(out.dtype))

    return jax.lax.fori_loop(0, iters, body, x0)


def run(N=65536, E=1048576, F=128):
    rng = np.random.default_rng(0)
    rids = np.sort(rng.integers(0, N, E).astype(np.int32))
    s_sorted = rng.integers(0, N, E).astype(np.int32)
    w = rng.normal(size=E).astype(np.float32)
    rp = jnp.asarray(np.searchsorted(rids, np.arange(N + 1)).astype(np.int32))
    rj = jnp.asarray(rids)
    sj = jnp.asarray(s_sorted)

    for dtype in (jnp.float32, jnp.bfloat16):
        wj = jnp.asarray(w).astype(dtype)
        xj = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32)).astype(dtype)

        def xla_sorted(h):
            return jax.ops.segment_sum(h[sj] * wj[:, None], rj,
                                       num_segments=N)

        def pallas(h):
            return sorted_segment_sum_pallas(h[sj] * wj[:, None], rj, rp, N)

        def grouped(h):
            return sorted_segment_sum_grouped(
                h[sj] * wj[:, None], rj, rp, N).astype(h.dtype)

        for name, fn in (("xla_sorted", xla_sorted), ("pallas", pallas),
                         ("grouped", grouped)):
            f = jax.jit(lambda x0, fn=fn: jnp.sum(
                chain(fn, x0).astype(jnp.float32)))
            float(f(xj))
            t0 = time.perf_counter(); float(f(xj))
            t_one = time.perf_counter() - t0
            t0 = time.perf_counter()
            outs = [f(xj) for _ in range(4)]
            float(outs[-1])
            t_four = time.perf_counter() - t0
            dt = max(t_four - t_one, 1e-9) / (3 * ITERS)
            bytes_per = 4 if dtype == jnp.float32 else 2
            label = "f32" if dtype == jnp.float32 else "bf16"
            print(f"{label:5s} {name:10s}: {dt*1e3:7.3f} ms  "
                  f"{E/dt/1e9:6.2f} Gedge/s  eff-BW "
                  f"{(E*F*bytes_per*2 + N*F*bytes_per)/dt/1e9:6.0f} GB/s",
                  flush=True)


if __name__ == "__main__":
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    E = int(sys.argv[2]) if len(sys.argv) > 2 else 1048576
    run(N, E)
