"""Round-4 experiment: is Mosaic's tpu.dynamic_gather (sublane gather via
jnp.take_along_axis axis=0) usable as the in-VMEM row gather for a fused
SpMM?  (VERDICT r3 next-step #6: VMEM-resident feature tile.)

Measures, on the real chip:
  * correctness of take_along_axis(x, idx, 0) inside a Pallas kernel
    at growing sublane extents N;
  * gather throughput vs the XLA HBM row-gather baseline.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def gather_kernel(x_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:], axis=0)


def vmem_gather(x, idx2d, interpret=False):
    return pl.pallas_call(
        gather_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, idx2d)


def bench(fn, *args, iters=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rng = np.random.default_rng(0)
    F = 128
    for dtype in (jnp.float32, jnp.bfloat16):
        for N in (256, 1024, 8192, 32768):
            x = jnp.asarray(rng.standard_normal((N, F)), dtype)
            idx = jnp.asarray(rng.integers(0, N, size=(N,)), jnp.int32)
            idx2d = jnp.broadcast_to(idx[:, None], (N, F))
            try:
                got = vmem_gather(x, idx2d)
                ok = bool(jnp.allclose(got, x[idx], atol=0))
                ms = bench(jax.jit(vmem_gather), x, idx2d)
                ms_xla = bench(jax.jit(lambda x, i: x[i]), x, idx)
                print(f"dtype={x.dtype} N={N:6d}: ok={ok} "
                      f"pallas={ms:.4f} ms  xla={ms_xla:.4f} ms")
            except Exception as e:  # noqa: BLE001
                msg = str(e).split("\n")[0][:140]
                print(f"dtype={x.dtype} N={N:6d}: FAIL {type(e).__name__}: {msg}")


if __name__ == "__main__":
    main()
