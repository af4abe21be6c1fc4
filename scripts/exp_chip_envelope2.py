"""Chip envelope, take 2 (the v1 probes were confounded by constant
folding / weight rematerialization):

  hbm   : y = a*x + b over a 256 MB RANDOM device array (argument, not
          constant), fori-chained
  mm_F  : x' = Aᵀ(A x) with A [2048,2048] fixed argument, carry x
          [2048, F]; both matmuls have output width F → isolates the
          narrow-output effect at fixed operand sizes
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 30


def timed(f, *args):
    jf = jax.jit(f)
    jax.block_until_ready(jf(*args))
    t0 = time.perf_counter()
    jax.block_until_ready(jf(*args))
    return (time.perf_counter() - t0) / ITERS


def main():
    rng = np.random.default_rng(0)

    # HBM
    n = 64 * 2**20  # 256 MB f32
    x = jnp.asarray(rng.normal(size=n).astype(np.float32))

    def hbm(x):
        def body(_, v):
            return v * 1.0000001 + 1e-9
        return jax.lax.fori_loop(0, ITERS, body, x)

    dt = timed(hbm, x)
    print(f"hbm_axpb       {dt*1e3:8.3f} ms  "
          f"{2 * 4 * n / dt / 1e9:7.1f} GB/s", flush=True)

    # matmul width sweep
    K = 2048
    A = jnp.asarray(rng.normal(size=(K, K)).astype(np.float32) / 45.0)
    for F in (128, 512, 2048):
        x0 = jnp.asarray(rng.normal(size=(K, F)).astype(np.float32))

        def mm(A, x0):
            def body(_, v):
                y = A @ v
                v2 = A.T @ y
                s = jax.lax.rsqrt(jnp.mean(v2 * v2) + 1e-12)
                return v2 * s
            return jax.lax.fori_loop(0, ITERS, body, x0)

        dt = timed(mm, A, x0)
        fl = 2 * 2 * K * K * F
        print(f"mm_F{F:<5d}     {dt*1e3:8.3f} ms  {fl/dt/1e12:6.2f} TF/s",
              flush=True)

    # bmm width sweep at the bench batch shape
    B, N = 64, 256
    Ab = jnp.asarray(rng.normal(size=(B, N, N)).astype(np.float32) / 16.0)
    for F in (128, 512):
        x0 = jnp.asarray(rng.normal(size=(B, N, F)).astype(np.float32))

        def bmm(Ab, x0):
            def body(_, v):
                y = jnp.einsum("bnm,bmf->bnf", Ab, v)
                s = jax.lax.rsqrt(jnp.mean(y * y) + 1e-12)
                return y * s
            return jax.lax.fori_loop(0, ITERS, body, x0)

        dt = timed(bmm, Ab, x0)
        fl = 2 * B * N * N * F
        print(f"bmm_B64_F{F:<4d}  {dt*1e3:8.3f} ms  {fl/dt/1e12:6.2f} TF/s",
              flush=True)


if __name__ == "__main__":
    main()
