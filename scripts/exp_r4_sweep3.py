"""Round-4 sweep #3 (the decisive one): chain-mode (in-program) numbers
for the sorted-CSR SpMM pipeline with DCE-proof accounting.

Motivation: exp_r4_sweep2 (dispatch mode) measured ~6.6 ms for EVERY
gather index pattern including a contiguous iota copy -> that mode is
bound by per-dispatch output allocation, not index locality.  Round-3's
1.97 ms gather-leg chain sliced the gathered [E,F] to [N,F], which XLA's
simplifier may fold into gathering only N rows -> possible underestimate.
Here:
  (a) gather leg with a reshape-sum reduction that forces every gathered
      row to be produced (E = 16*N exactly);
  (b) kernel-only small-BR sweep (one-hot matmul costs E*BR*F MACs, so
      smaller block_rows cuts MXU work linearly; round-3 swept BR upward
      only);
  (c) full SpMM (gather + weight + grouped kernel) chained h -> h, the
      number a train step actually sees per message-passing layer.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from tgp_tpu.ops.pallas.segment_spmm import sorted_segment_sum_grouped

ITERS = 30


def timed(f, x0):
    out = f(x0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = f(x0)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / ITERS * 1e3


def main():
    rng = np.random.default_rng(0)
    N, F = 65_536, 128
    E = 16 * N  # 1_048_576, exact multiple so reshape-sum works
    senders = rng.integers(0, N, E)
    receivers = np.sort(rng.integers(0, N, E))
    x = jnp.asarray(rng.standard_normal((N, F)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((E,)), jnp.bfloat16)
    counts = np.bincount(receivers, minlength=N)
    row_ptr = jnp.asarray(np.concatenate([[0], np.cumsum(counts)]), jnp.int32)
    rsort = jnp.asarray(receivers, jnp.int32)

    print("== (a) chain-mode gather leg, reshape-sum (DCE-proof) ==",
          flush=True)
    for label, idx_np in [("random", senders),
                          ("sorted", np.sort(senders)),
                          ("iota  ", np.arange(E) % N)]:
        idx = jnp.asarray(idx_np, jnp.int32)

        def gather_leg(h, idx=idx):
            m = h[idx] * w[:, None]          # [E, F], every row needed
            return m.reshape(E // N, N, F).sum(0).astype(h.dtype)

        f = jax.jit(lambda x0, g=gather_leg: jnp.sum(
            jax.lax.fori_loop(0, ITERS, lambda i, h: g(h * 0.99), x0)
            .astype(jnp.float32)))
        ms = timed(f, x)
        tr = (E * F * 2 * 2) / (ms / 1e3) / 1e9
        print(f"  {label}: {ms:7.3f} ms  {tr:6.0f} GB/s (if materialized)",
              flush=True)

    print("== (b) kernel-only small-BR sweep (chain mode) ==", flush=True)
    msgs0 = jnp.asarray(rng.standard_normal((E, F)), jnp.bfloat16)
    for br, be in [(256, 2048), (128, 2048), (128, 4096), (64, 2048),
                   (64, 4096), (128, 1024), (32, 2048), (512, 2048)]:
        try:
            def step(i, acc, bp=br, bep=be):
                out = sorted_segment_sum_grouped(
                    msgs0 * acc[0, 0], rsort, row_ptr, N,
                    block_rows=bp, block_edges=bep)
                s = jax.lax.rsqrt(
                    jnp.mean(out.astype(jnp.float32) ** 2) + 1e-12)
                return acc * 0 + s.astype(acc.dtype)
            f = jax.jit(lambda a0, s=step: jnp.sum(
                jax.lax.fori_loop(0, ITERS, s, a0).astype(jnp.float32)))
            ms = timed(f, jnp.ones((8, 128), jnp.bfloat16))
            print(f"  BR={br:4d} BE={be:5d}: {ms:7.3f} ms "
                  f"(incl. msgs re-scale read)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  BR={br:4d} BE={be:5d}: FAIL "
                  f"{str(e).splitlines()[0][:100]}", flush=True)

    print("== (c) full SpMM chained h->h (gather+weight+kernel) ==",
          flush=True)
    sj = jnp.asarray(senders, jnp.int32)
    for br, be in [(256, 2048), (128, 2048), (128, 4096), (64, 4096)]:
        try:
            def spmm_step(i, h, bp=br, bep=be):
                m = h[sj] * w[:, None]
                y = sorted_segment_sum_grouped(
                    m, rsort, row_ptr, N, block_rows=bp, block_edges=bep)
                s = jax.lax.rsqrt(
                    jnp.mean(y.astype(jnp.float32) ** 2) + 1e-12)
                return (y * s).astype(h.dtype)
            f = jax.jit(lambda x0, s=spmm_step: jnp.sum(
                jax.lax.fori_loop(0, ITERS, s, x0).astype(jnp.float32)))
            ms = timed(f, x)
            eps = E / (ms / 1e3) / 1e6
            print(f"  BR={br:4d} BE={be:5d}: {ms:7.3f} ms  "
                  f"{eps:7.1f} M edges/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  BR={br:4d} BE={be:5d}: FAIL "
                  f"{str(e).splitlines()[0][:100]}", flush=True)


if __name__ == "__main__":
    main()
