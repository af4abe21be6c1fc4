"""Dual-length chained bmm timing: per-step = (t_long - t_short)/(L-S),
each measured as the median of 5 blocking calls. RTT and constant overhead
cancel; the chained dependency defeats loop-invariant code motion."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

SHORT, LONG = 20, 220


def median_time(jfn, *args, reps=5):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(jfn(*args))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def chain_dual(fn, a, h):
    def make(steps):
        def run(a, h):
            def body(hc, _):
                o = fn(a, hc)
                return (o * 1e-2).astype(h.dtype), None
            hF, _ = jax.lax.scan(body, h, None, length=steps)
            return hF.astype(jnp.float32).sum()
        return jax.jit(run)
    f_s, f_l = make(SHORT), make(LONG)
    jax.block_until_ready(f_s(a, h))  # compile
    jax.block_until_ready(f_l(a, h))
    t_s = median_time(f_s, a, h)
    t_l = median_time(f_l, a, h)
    return max(t_l - t_s, 1e-9) / (LONG - SHORT)


def main():
    from tgp_tpu.ops.pallas.bmm import bmm_pallas

    rng = np.random.default_rng(0)
    print("devices:", jax.devices(), flush=True)

    for (B, N, F) in [(64, 256, 128), (64, 128, 128)]:
        a = jnp.asarray(rng.normal(size=(B, N, N)).astype(np.float32))
        a16 = a.astype(jnp.bfloat16)
        h = jnp.asarray(rng.normal(size=(B, N, F)).astype(np.float32))
        h16 = h.astype(jnp.bfloat16)
        gf = 2 * B * N * N * F / 1e9
        mb = (a16.nbytes + B * N * F * 2 * 2) / 1e6

        cases = [
            ("xla_bf16", lambda a, h: jnp.einsum(
                "bnm,bmf->bnf", a, h.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32), a16, h16),
            ("xla_f32", lambda a, h: jnp.einsum(
                "bnm,bmf->bnf", a, h, preferred_element_type=jnp.float32),
             a, h),
            ("pallas_b8", lambda a, h: bmm_pallas(a, h, block_b=8), a16, h16),
            ("pallas_b32", lambda a, h: bmm_pallas(a, h, block_b=32),
             a16, h16),
        ]
        for name, fn, aa, hh in cases:
            try:
                dt = chain_dual(fn, aa, hh)
                print(f"[{B}x{N}x{F}] {name:11s} {dt*1e6:8.1f} us  "
                      f"{gf/dt:6.2f} TF/s  {mb/1e3/dt:6.1f} GB/s",
                      flush=True)
            except Exception as e:
                print(f"[{B}x{N}x{F}] {name:11s} FAILED: {type(e).__name__}",
                      flush=True)


if __name__ == "__main__":
    main()
