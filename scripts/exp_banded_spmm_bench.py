"""Fused banded SpMM vs unfused paths, float-synced, on a packed batch of
small graphs (the layout the band contract targets): 256 graphs x 256
nodes, ER p=0.03, F=128 -> N=65k, E~500k.

Paths:
  xla      — gather + XLA scatter segment_sum (random order)
  xla_sort — gather + XLA segment_sum(indices_are_sorted)
  pallas   — gather + Pallas sorted-CSR segment-sum (unfused)
  banded   — fused gather+segment-sum Pallas kernel (window DMA, one-hot MXU)
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from tgp_tpu.ops.pallas.segment_spmm import (banded_sorted_spmm_pallas,
                                             check_band_contract,
                                             sorted_segment_sum_pallas)

ITERS = 30
G, N_PER, P, F = 256, 256, 0.03, 128


def chain(fn, x0, iters=ITERS):
    def body(i, acc):
        out = fn(acc)
        scale = jax.lax.rsqrt(jnp.mean(out * out) + 1e-12)
        return out * scale
    return jax.lax.fori_loop(0, iters, body, x0)


def main():
    rng = np.random.default_rng(0)
    N = G * N_PER
    s_all, r_all = [], []
    for g in range(G):
        upper = np.triu(rng.random((N_PER, N_PER)) < P, 1)
        adj = upper | upper.T
        s, r = np.nonzero(adj)
        s_all.append(s + g * N_PER)
        r_all.append(r + g * N_PER)
    s = np.concatenate(s_all).astype(np.int32)
    r = np.concatenate(r_all).astype(np.int32)
    order = np.argsort(r, kind="stable")
    s, r = s[order], r[order]
    E = s.shape[0]
    w = rng.uniform(0.5, 1.5, E).astype(np.float32)
    x = rng.normal(size=(N, F)).astype(np.float32)
    row_ptr = np.searchsorted(r, np.arange(N + 1)).astype(np.int32)
    print(f"N={N} E={E} band_ok="
          f"{check_band_contract(s, r, np.ones(E, bool), N, 128, 512)}",
          flush=True)

    sj, rj, wj = jnp.asarray(s), jnp.asarray(r), jnp.asarray(w)
    rp, xj = jnp.asarray(row_ptr), jnp.asarray(x)

    def xla(h):
        return jax.ops.segment_sum(h[sj] * wj[:, None], rj, num_segments=N)

    def xla_sort(h):
        return jax.ops.segment_sum(h[sj] * wj[:, None], rj, num_segments=N,
                                   indices_are_sorted=True)

    def pallas_unfused(h):
        return sorted_segment_sum_pallas(h[sj] * wj[:, None], rj, rp, N)

    def banded(h):
        return banded_sorted_spmm_pallas(h, sj, rp, wj, N, window=512)

    ref = np.asarray(xla(xj))
    for name, fn in (("xla", xla), ("xla_sort", xla_sort),
                     ("pallas", pallas_unfused), ("banded", banded)):
        out = np.asarray(jax.jit(fn)(xj))
        err = np.max(np.abs(out - ref) / (np.abs(ref) + 1e-3))
        f = jax.jit(lambda x0, fn=fn: jnp.sum(chain(fn, x0)))
        float(f(xj))  # compile + warm
        t0 = time.perf_counter(); float(f(xj)); t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        outs = [f(xj) for _ in range(4)]
        float(outs[-1])
        t4 = time.perf_counter() - t0
        dt = max(t4 - t1, 1e-9) / (3 * ITERS)
        bw = (E * F * 4 * 2 + N * F * 4) / dt / 1e9
        print(f"{name:10s} {dt*1e3:7.3f} ms  {E/dt/1e9:5.2f} Gedge/s  "
              f"eff-BW {bw:6.0f} GB/s  err {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
