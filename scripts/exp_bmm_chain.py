"""Chained-dependency bmm timing (defeats loop-invariant code motion: each
scan step consumes the previous output), plus a step-term ablation of the
dense train step at bench shapes."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

STEPS = 200


def timed(fn, *args):
    jfn = jax.jit(fn)
    t0 = time.perf_counter()
    jax.block_until_ready(jfn(*args))
    comp = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.block_until_ready(jfn(*args))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    outs = [jfn(*args) for _ in range(6)]
    jax.block_until_ready(outs)
    tm = time.perf_counter() - t0
    return max(tm - t1, 1e-9) / 5, comp


def chain(fn, a, h, steps=STEPS):
    def run(a, h):
        def body(hc, _):
            o = fn(a, hc)
            return (o * 1e-2).astype(h.dtype), None
        hF, _ = jax.lax.scan(body, h, None, length=steps)
        return hF.astype(jnp.float32).sum()
    dt, comp = timed(run, a, h)
    return dt / steps, comp


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
        mb = (a16.nbytes + B * N * F * 2 * 2) / 1e6  # adj + h read + out write

        cases = [
            ("xla_bf16", lambda a, h: jnp.einsum(
                "bnm,bmf->bnf", a, h.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32), a16, h16),
            ("xla_f32", lambda a, h: jnp.einsum(
                "bnm,bmf->bnf", a, h, preferred_element_type=jnp.float32),
             a, h),
            ("pallas_b8", lambda a, h: bmm_pallas(a, h, block_b=8), a16, h16),
            ("pallas_b16", lambda a, h: bmm_pallas(a, h, block_b=16),
             a16, h16),
            ("pallas_b32", lambda a, h: bmm_pallas(a, h, block_b=32),
             a16, h16),
        ]
        for name, fn, aa, hh in cases:
            try:
                dt, comp = chain(fn, aa, hh)
                print(f"[{B}x{N}x{F}] {name:11s} {dt*1e6:8.1f} us  "
                      f"{gf/dt:6.2f} TF/s  {mb/1e3/dt:6.1f} GB/s "
                      f"(compile {comp:.0f}s)", flush=True)
            except Exception as e:
                print(f"[{B}x{N}x{F}] {name:11s} FAILED: {type(e).__name__}",
                      flush=True)


if __name__ == "__main__":
    main()
