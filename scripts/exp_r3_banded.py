"""Round-3 locality experiment: does the fused banded kernel beat
gather+grouped on a bandwidth-reduced graph at E=1M?

Graph: random banded (|s−r| ≤ bw) at N=64k, E=1M, F=128 — the layout RCM
produces for locality-friendly graphs (meshes, molecules, road networks).
Pipelines compared under the 512KB-patch chain (float-synced):

  gather_grouped : x[senders]·w → grouped sorted-CSR segment-sum
  banded         : fused one-hot-matmul gather from a VMEM x-window
  xla            : x[senders]·w → XLA sorted scatter (reference-equivalent)
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

N, E, F = 65_536, 1_048_576, 128
ITERS = 30


def main(BW=1024):
    import jax
    import jax.numpy as jnp

    from tgp_tpu.ops.ordering import choose_banded_window
    from tgp_tpu.ops.pallas.segment_spmm import (
        sorted_segment_sum_grouped,
        spmm_banded,
    )

    rng = np.random.default_rng(0)
    r = np.sort(rng.integers(0, N, E)).astype(np.int32)
    s = np.clip(r + rng.integers(-BW, BW + 1, E), 0, N - 1).astype(np.int32)
    w = rng.normal(size=E).astype(np.float32)
    counts = np.bincount(r, minlength=N)
    row_ptr = jnp.asarray(
        np.concatenate([[0], np.cumsum(counts)]).astype(np.int32))
    sj, rj, wj = jnp.asarray(s), jnp.asarray(r), jnp.asarray(w)
    x = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    window = choose_banded_window(BW)
    print(f"bandwidth={BW} window={window}", flush=True)

    def fmedian(f, n=5):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            f()
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[n // 2]

    def timed(tag, fn):
        def run(h):
            def body(c, _):
                out = fn(c)
                patch = (c[:128] + out[:1, :].astype(c.dtype) * 1e-6
                         ).astype(c.dtype)
                c = jax.lax.dynamic_update_slice(c, patch, (0, 0))
                return c, out[0, 0]
            c, last = jax.lax.scan(body, h, None, length=ITERS)
            return last[-1].astype(jnp.float32)

        run_s = jax.jit(run)
        t0 = time.perf_counter()
        float(run_s(x))
        comp = time.perf_counter() - t0
        t1 = fmedian(lambda: float(run_s(x)))
        t4 = fmedian(lambda: float([run_s(x) for _ in range(4)][-1]))
        dt = max(t4 - t1, 1e-9) / (3 * ITERS)
        print(f"{tag:16s} {dt*1e3:7.2f} ms  ({E/dt/1e9:5.2f} Gedge/s)"
              f"  [compile {comp:.0f}s]", flush=True)

    timed(f"gather_grouped_bw{BW}", lambda h: sorted_segment_sum_grouped(
        h[sj] * wj[:, None].astype(h.dtype), None, row_ptr, N))
    timed(f"banded_bw{BW}_w{window}", lambda h: spmm_banded(
        h, sj, rj, wj.astype(h.dtype), N, window=window))


if __name__ == "__main__":
    import sys as _sys

    for bw in ([int(a) for a in _sys.argv[1:]] or [192, 448, 1024]):
        main(bw)
