"""Kernel microbenchmarks on the real TPU: XLA segment_sum (random/sorted)
vs the Pallas sorted-CSR kernel.  All timing happens inside ONE jitted
fori_loop chain (per-call dispatch through the axon tunnel would dominate
otherwise), with magnitude renormalization so values neither underflow nor
explode (an earlier underflow produced fake 100 TB/s numbers)."""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from tgp_tpu.ops.pallas.segment_spmm import sorted_segment_sum_pallas

ITERS = 30


def chain(fn, x0, iters=ITERS):
    def body(i, acc):
        out = fn(acc)
        # renormalize magnitude cheaply (scalar rms)
        scale = jax.lax.rsqrt(jnp.mean(out * out) + 1e-12)
        return out * scale

    return jax.lax.fori_loop(0, iters, body, x0)


def run(N=16384, E=262144, F=128):
    rng = np.random.default_rng(0)
    senders = rng.integers(0, N, E).astype(np.int32)
    rids_unsorted = rng.integers(0, N, E).astype(np.int32)
    order = np.argsort(rids_unsorted)
    rids = rids_unsorted[order]
    s_sorted = senders[order]
    w = rng.normal(size=E).astype(np.float32)
    row_ptr = np.searchsorted(rids, np.arange(N + 1)).astype(np.int32)
    x = rng.normal(size=(N, F)).astype(np.float32)

    sj = jnp.asarray(s_sorted)
    rj = jnp.asarray(rids)
    ru = jnp.asarray(rids_unsorted)
    su = jnp.asarray(senders)
    wj = jnp.asarray(w)
    rp = jnp.asarray(row_ptr)
    xj = jnp.asarray(x)

    def spmm_xla_sorted(h):
        return jax.ops.segment_sum(h[sj] * wj[:, None], rj, num_segments=N)

    def spmm_xla_random(h):
        return jax.ops.segment_sum(h[su] * wj[:, None], ru, num_segments=N)

    def spmm_pallas(h):
        return sorted_segment_sum_pallas(h[sj] * wj[:, None], rj, rp, N)

    def spmm_pallas_fast(h):
        return sorted_segment_sum_pallas(h[sj] * wj[:, None], rj, rp, N,
                                         precision=jax.lax.Precision.DEFAULT)

    results = {}
    for name, fn in (("xla_random", spmm_xla_random),
                     ("xla_sorted", spmm_xla_sorted),
                     ("pallas", spmm_pallas),
                     ("pallas_bf16", spmm_pallas_fast)):
        # sync via a scalar host transfer — block_until_ready is NOT an
        # execution barrier on axon (scripts/exp_bench_timing.py)
        f = jax.jit(lambda x0, fn=fn: jnp.sum(chain(fn, x0)))
        float(f(xj))  # compile + warm
        t0 = time.perf_counter()
        float(f(xj))
        t_one = time.perf_counter() - t0
        t0 = time.perf_counter()
        outs = [f(xj) for _ in range(4)]
        float(outs[-1])
        t_four = time.perf_counter() - t0
        dt = max(t_four - t_one, 1e-9) / (3 * ITERS)
        gedges = E / dt / 1e9
        results[name] = dt
        print(f"{name:12s}: {dt*1e3:7.3f} ms/iter  {gedges:6.2f} Gedge/s  "
              f"eff-BW {(E*F*4*2 + N*F*4)/dt/1e9:6.0f} GB/s", flush=True)
    return results


if __name__ == "__main__":
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    E = int(sys.argv[2]) if len(sys.argv) > 2 else 262144
    F = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    run(N, E, F)
