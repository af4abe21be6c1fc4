"""Round-3 sorted-CSR kernel rewrite benchmark: blocked (round-2) vs
grouped work-item grid (round-3), block-size sweep, on the real TPU.

Workload matches exp_kernel_sweep.py: E=1M, N=64k, F=128, bf16 messages,
30-iteration dependency chain, float-synced timing.  Also prints the XLA
scatter path and the gather-leg cost for reference.
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

    from tgp_tpu.ops.pallas.segment_spmm import (
        sorted_segment_sum_grouped,
        sorted_segment_sum_pallas,
    )

    rng = np.random.default_rng(0)
    rids = np.sort(rng.integers(0, N, E)).astype(np.int32)
    counts = np.bincount(rids, minlength=N)
    row_ptr = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    msgs = rng.normal(size=(E, F)).astype(np.float32)

    msgs_bf = jnp.asarray(msgs).astype(jnp.bfloat16)
    row_ptr_j = jnp.asarray(row_ptr)

    want = np.asarray(jax.ops.segment_sum(
        jnp.asarray(msgs), jnp.asarray(rids), num_segments=N))
    peak = np.abs(want).max()

    def fmedian(f, n=5):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            f()
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[n // 2]

    def timed(tag, fn):
        """fn: (msgs) -> [N, F]; chained ITERS times via a bf16 feedback."""
        def run(m):
            def body(c, _):
                out = fn(c)
                # chain via a single-chunk patch (512 KB) instead of a full
                # 256 MB carry rewrite (which alone costs ~0.6 ms/iter of
                # HBM traffic and flattened the first sweep's separation)
                patch = (c[:128] + out[:1, :].astype(c.dtype) * 1e-6
                         ).astype(c.dtype)
                c = jax.lax.dynamic_update_slice(c, patch, (0, 0))
                return c, out[0, 0]
            c, last = jax.lax.scan(body, m, None, length=ITERS)
            return last[-1].astype(jnp.float32)

        run_s = jax.jit(run)
        t0 = time.perf_counter()
        out_probe = fn(msgs_bf)
        err = float(np.abs(np.asarray(out_probe, np.float32) - want).max()
                    / peak)
        float(run_s(msgs_bf))
        comp = time.perf_counter() - t0
        t1 = fmedian(lambda: float(run_s(msgs_bf)))
        t4 = fmedian(lambda: float([run_s(msgs_bf) for _ in range(4)][-1]))
        dt = max(t4 - t1, 1e-9) / (3 * ITERS)
        gbs = (E * F * 2 + N * F * 4) / dt / 1e9
        print(f"{tag:24s} {dt*1e3:7.2f} ms  ({gbs:5.0f} GB/s eff, "
              f"rel-err {err:.1e})  [compile {comp:.0f}s]", flush=True)

    timed("xla_scatter_sorted", lambda m: jax.ops.segment_sum(
        m.astype(jnp.float32), jnp.asarray(rids), num_segments=N,
        indices_are_sorted=True))

    timed("blocked_256_2048", lambda m: sorted_segment_sum_pallas(
        m, None, row_ptr_j, N, block_rows=256, block_edges=2048))

    for br, be in [(128, 1024), (256, 2048), (512, 2048), (256, 4096)]:
        timed(f"grouped_{br}_{be}",
              functools.partial(
                  lambda m, br=br, be=be: sorted_segment_sum_grouped(
                      m, None, row_ptr_j, N, block_rows=br, block_edges=be)))


if __name__ == "__main__":
    main()
