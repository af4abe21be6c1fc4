"""Round-4 sweep #2: (a) fatter block sizes for the grouped sorted-CSR
kernel (it measured latency-bound in round 3: total ~independent of block
shape → fewer, bigger work items should win until MXU/VPU work dominates);
(b) XLA row-gather throughput with sorted vs random indices (quantifies the
real headroom of the gather leg)."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from tgp_tpu.ops.pallas.segment_spmm import sorted_segment_sum_grouped


def bench(fn, *args, iters=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rng = np.random.default_rng(0)
    E, N, F = 1_000_000, 65_536, 128
    senders = rng.integers(0, N, E)
    receivers = np.sort(rng.integers(0, N, E))
    x = jnp.asarray(rng.standard_normal((N, F)), jnp.bfloat16)
    msgs = jnp.asarray(rng.standard_normal((E, F)), jnp.bfloat16)
    counts = np.bincount(receivers, minlength=N)
    row_ptr = jnp.asarray(np.concatenate([[0], np.cumsum(counts)]), jnp.int32)
    rsort = jnp.asarray(receivers, jnp.int32)

    print("== (a) grouped-kernel block sweep ==")
    for br, be in [(256, 2048), (256, 4096), (512, 4096), (512, 8192),
                   (1024, 8192), (256, 8192)]:
        try:
            fn = jax.jit(lambda m, bp=br, bep=be: sorted_segment_sum_grouped(
                m, rsort, row_ptr, N, block_rows=bp, block_edges=bep))
            ms = bench(fn, msgs)
            print(f"  BR={br:5d} BE={be:5d}: {ms:.3f} ms")
        except Exception as e:  # noqa: BLE001
            print(f"  BR={br:5d} BE={be:5d}: FAIL {str(e).splitlines()[0][:100]}")

    print("== (b) XLA row gather: sorted vs random indices ==")
    idx_rand = jnp.asarray(senders, jnp.int32)
    idx_sorted = jnp.sort(idx_rand)
    gather = jax.jit(lambda i: x[i])
    gather_hint = jax.jit(lambda i: jax.lax.gather(
        x, i[:, None],
        jax.lax.GatherDimensionNumbers(offset_dims=(1,),
                                       collapsed_slice_dims=(0,),
                                       start_index_map=(0,)),
        slice_sizes=(1, F), indices_are_sorted=True,
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS))
    print(f"  random : {bench(gather, idx_rand):.3f} ms")
    print(f"  sorted : {bench(gather, idx_sorted):.3f} ms")
    print(f"  sorted+hint: {bench(gather_hint, idx_sorted):.3f} ms")
    # contiguous baseline: pure streaming copy of the same bytes
    print(f"  iota(copy) : {bench(gather, jnp.arange(E, dtype=jnp.int32) % N):.3f} ms")


if __name__ == "__main__":
    main()
