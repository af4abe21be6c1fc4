"""Experiment (VERDICT r3 #6): VMEM-resident fused gather+segment-sum.

Question: when ``x`` fits VMEM (bf16, N≤~48k at F=128), can a Pallas kernel
gather ``x[sender_e]`` rows *inside* the kernel — skipping the HBM ``msgs``
round-trip (E·F write + E·F read ≈ 0.6 ms at E=1M) and moving the random
256 B row reads from HBM (~130 GB/s effective) to VMEM?

Mosaic has no documented gather primitive (pallas_guide.md), so this probes
what actually lowers on the chip, then times the winner against the
two-leg baseline (XLA gather → grouped kernel).

Probes:
  A. ``jnp.take(x, idx, axis=0)``   — x in VMEM, idx from SMEM-prefetch
  B. one-hot MXU gather             — oh[c, n] = (iota_n == idx_c), oh @ x
                                      (always lowers; cost CHUNK·N·F MACs)
  C. per-row ``pl.load`` fori_loop  — 1 dynamic-slice copy per edge

Run:  python scripts/exp_vmem_gather.py [--interpret]
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, F, E = 16384, 128, 1 << 20
CHUNK = 128


def _probe_a_kernel(idx_ref, x_ref, out_ref):
    c = pl.program_id(0)
    ids = idx_ref[pl.ds(c * CHUNK, CHUNK)]
    out_ref[:] = jnp.take(x_ref[:], ids, axis=0)


def probe_a(x, idx, interpret):
    grid = (E // CHUNK,)
    return pl.pallas_call(
        _probe_a_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[pl.BlockSpec((N, F), lambda c, *_: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((CHUNK, F), lambda c, *_: (c, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((E, F), x.dtype),
        interpret=interpret,
    )(idx, x)


def _probe_c_kernel(idx_ref, x_ref, out_ref):
    c = pl.program_id(0)

    def body(i, _):
        r = idx_ref[c * CHUNK + i]
        out_ref[pl.ds(i, 1), :] = x_ref[pl.ds(r, 1), :]
        return 0

    jax.lax.fori_loop(0, CHUNK, body, 0)


def probe_c(x, idx, interpret):
    grid = (E // CHUNK,)
    return pl.pallas_call(
        _probe_c_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[pl.BlockSpec((N, F), lambda c, *_: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((CHUNK, F), lambda c, *_: (c, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((E, F), x.dtype),
        interpret=interpret,
    )(idx, x)


def _time(fn, *args):
    out = jax.block_until_ready(fn(*args))
    # real sync on axon: device-to-host copy of a reduction
    float(jnp.sum(out[0]))
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    float(jnp.sum(out[:1]).block_until_ready())
    jax.block_until_ready(out)
    float(np.asarray(out[0, 0]))
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(N, F)), jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, N, E), jnp.int32)
    want = np.asarray(jnp.take(x, idx, axis=0)[:256], jnp.float32)

    for name, fn in [("A jnp.take", probe_a), ("C row-loop", probe_c)]:
        try:
            f = jax.jit(functools.partial(fn, interpret=args.interpret))
            got = f(x, idx)
            np.testing.assert_allclose(
                np.asarray(got[:256], np.float32), want, rtol=0)
            dt = _time(f, x, idx)
            gbs = E * F * x.dtype.itemsize / dt / 1e9
            print(f"{name}: OK  {dt*1e3:.3f} ms  ({gbs:.0f} GB/s gather)")
        except Exception as e:  # noqa: BLE001 — probe: record and move on
            print(f"{name}: FAILED — {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:200]}")

    # baseline: plain XLA gather from HBM at the same shape
    g = jax.jit(lambda x, i: jnp.take(x, i, axis=0))
    dt = _time(g, x, idx)
    print(f"XLA gather baseline: {dt*1e3:.3f} ms "
          f"({E * F * x.dtype.itemsize / dt / 1e9:.0f} GB/s)")


if __name__ == "__main__":
    main()
