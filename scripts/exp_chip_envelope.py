"""Chip envelope calibration: pure HBM bandwidth (saxpy chain) and matmul
throughput vs OUTPUT WIDTH at fixed FLOPs — to pin why the [*,*,*]@[*,*,128]
bmms top out at ~7 TF/s (narrow-output pipelines can't amortize operand
loads)."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def chain(op, x0, iters):
    def run(x):
        def body(_, x):
            y = op(x)
            s = jax.lax.rsqrt(jnp.mean(jnp.square(y)) + 1e-12)
            return (y * s).astype(x.dtype)
        return jax.lax.fori_loop(0, iters, body, x)

    f = jax.jit(run)
    jax.block_until_ready(f(x0))
    t0 = time.perf_counter()
    jax.block_until_ready(f(x0))
    return (time.perf_counter() - t0) / iters


def main():
    # HBM bandwidth: y = 2x + 1 over 256 MB f32 (read+write = 512 MB/op)
    nbytes = 256 * 2**20
    x = jnp.ones(nbytes // 4, jnp.float32)
    dt = chain(lambda v: 2.0 * v + 1.0, x, 30)
    print(f"hbm_saxpy      {dt*1e3:8.2f} ms  "
          f"{2 * nbytes / dt / 1e9:7.1f} GB/s", flush=True)

    # matmul width sweep: [M,K]@[K,Fout], fixed 8.6 GFLOP
    K = 2048
    for Fout in (128, 512, 2048):
        M = int(8.6e9 / (2 * K * Fout))
        A = jnp.asarray(np.random.default_rng(0).normal(
            size=(M, K)).astype(np.float32))
        W = jnp.asarray(np.random.default_rng(1).normal(
            size=(K, Fout)).astype(np.float32))

        def op(x, A=A, W=W, M=M, Fout=Fout):
            y = A @ W  # noqa: F841 — x only threads the chain
            return x + y.sum() * 1e-20

        # thread a scalar through the chain; force the matmul each iter by
        # making W depend on the carry
        def op2(x, A=A, W=W):
            y = A @ (W + x * 1e-20)
            return jnp.float32(y[0, 0] * 1e-20 + x)

        dt = chain(op2, jnp.float32(0.0), 30)
        fl = 2 * M * K * Fout
        print(f"mm_{M}x{K}x{Fout:<5d} {dt*1e3:8.2f} ms  "
              f"{fl/dt/1e12:6.2f} TF/s", flush=True)


if __name__ == "__main__":
    main()
