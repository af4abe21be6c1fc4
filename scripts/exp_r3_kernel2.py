"""Round-3 kernel diagnosis #2: what is the ~2.5 ms invariant?

exp_r3_kernel.py chained iterations by rewriting the full 256 MB msgs
carry each step — that alone is ~0.6+ ms/iter of extra HBM traffic.  Here:

  * chain via a 1-chunk dynamic_update_slice (512 KB, ~in-place in scan)
  * stream-only probe: same grid/specs, but the kernel just adds a 8-row
    slice of the chunk — measures achievable in_spec streaming bandwidth
  * no-mask probe: ones @ chunk (full matmul, no compare/select) —
    isolates the mask-build VPU cost
  * the real grouped kernel at the sweep winner (256, 2048)
"""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

E, N, F = 1_000_000, 65_536, 128
ITERS = 30


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from tgp_tpu.ops.pallas.segment_spmm import (
        _grouped_items,
        sorted_segment_sum_grouped,
    )

    rng = np.random.default_rng(0)
    rids = np.sort(rng.integers(0, N, E)).astype(np.int32)
    counts = np.bincount(rids, minlength=N)
    row_ptr = jnp.asarray(
        np.concatenate([[0], np.cumsum(counts)]).astype(np.int32))
    msgs = jnp.asarray(
        rng.normal(size=(E, F)).astype(np.float32)).astype(jnp.bfloat16)

    def fmedian(f, n=5):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            f()
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[n // 2]

    def timed(tag, fn):
        def run(m):
            def body(c, _):
                out = fn(c)
                patch = (c[:128] + out[:1, :].astype(c.dtype) * 1e-6
                         ).astype(c.dtype)
                c = jax.lax.dynamic_update_slice(c, patch, (0, 0))
                return c, out[0, 0]
            c, last = jax.lax.scan(body, m, None, length=ITERS)
            return last[-1].astype(jnp.float32)

        run_s = jax.jit(run)
        t0 = time.perf_counter()
        float(run_s(msgs))
        comp = time.perf_counter() - t0
        t1 = fmedian(lambda: float(run_s(msgs)))
        t4 = fmedian(lambda: float([run_s(msgs) for _ in range(4)][-1]))
        dt = max(t4 - t1, 1e-9) / (3 * ITERS)
        gbs = (E * F * 2) / dt / 1e9
        print(f"{tag:24s} {dt*1e3:7.2f} ms  ({gbs:5.0f} GB/s msgs-read)"
              f"  [compile {comp:.0f}s]", flush=True)

    BR, BE = 256, 2048

    def make_probe(mode):
        n_chunks_pad = (E + BE - 1) // BE
        E_pad = (n_chunks_pad + 1) * BE

        def probe(m):
            m = jnp.concatenate(
                [m, jnp.zeros((E_pad - E, F), m.dtype)])
            blk, chunk, is_first, t_max = _grouped_items(
                row_ptr, N, BR, BE, n_chunks_pad)
            lo = jnp.broadcast_to(row_ptr[:N, None], (N, 128))
            hi = jnp.broadcast_to(row_ptr[1:N + 1, None], (N, 128))

            def kern(b_ref, c_ref, f_ref, lo_ref, hi_ref, m_ref, o_ref):
                i = pl.program_id(0)

                @pl.when(f_ref[i] == 1)
                def _():
                    o_ref[:] = jnp.zeros_like(o_ref)

                if mode == "stream":
                    o_ref[:8, :] += m_ref[:8, :].astype(jnp.float32)
                elif mode == "nomask":
                    oh = jnp.full((BR, BE), 1.0, m_ref.dtype)
                    o_ref[:] += jnp.dot(
                        oh, m_ref[:], preferred_element_type=jnp.float32)

            return pl.pallas_call(
                kern,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=3,
                    grid=(t_max,),
                    in_specs=[
                        pl.BlockSpec((BR, 128), lambda i, b, c, f: (b[i], 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((BR, 128), lambda i, b, c, f: (b[i], 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((BE, F), lambda i, b, c, f: (c[i], 0),
                                     memory_space=pltpu.VMEM),
                    ],
                    out_specs=pl.BlockSpec(
                        (BR, F), lambda i, b, c, f: (b[i], 0),
                        memory_space=pltpu.VMEM),
                ),
                out_shape=jax.ShapeDtypeStruct((N, F), jnp.float32),
            )(blk, chunk, is_first, lo, hi, m)
        return probe

    timed("stream_only", make_probe("stream"))
    timed("matmul_no_mask", make_probe("nomask"))
    timed("grouped_256_2048", lambda m: sorted_segment_sum_grouped(
        m, None, row_ptr, N, block_rows=BR, block_edges=BE))


if __name__ == "__main__":
    main()
