"""Why is the batched [B,N,N]@[B,N,F] matmul only ~4.5 TF/s?  Envelope:
  bmm at B=64/N=256/F=128 (bench shape), f32 vs bf16
  bmm reshaped to fewer/bigger batches ([16,1024,...] via 4-graph blocks?) —
    not semantically valid for GCN, measured only as an UPPER BOUND shape
  one BIG matmul [16384,256]… not valid either; envelope only
  XLA scatter SpMM on the flat packed graph (honest, in-scan)
  banded fused Pallas kernel at the same workload
Each timed by a fori-chain inside ONE jitted call (renormalized)."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import functools

import jax
import jax.numpy as jnp
import numpy as np

B, N, F = 64, 256, 128
ITERS = 200


def chain(op, x0, iters=ITERS):
    """Run op iters times inside one jit (renormalize to avoid under/
    overflow), return per-op seconds."""
    def run(x):
        def body(_, x):
            y = op(x)
            scale = jax.lax.rsqrt(jnp.mean(jnp.square(y)) + 1e-12)
            return (y * scale).astype(x.dtype)
        return jax.lax.fori_loop(0, iters, body, x)

    f = jax.jit(run)
    jax.block_until_ready(f(x0))
    t0 = time.perf_counter()
    jax.block_until_ready(f(x0))
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    adj = (rng.random((B, N, N)) < 0.03).astype(np.float32)
    adj = np.maximum(adj, adj.transpose(0, 2, 1))
    h0 = rng.normal(size=(B, N, F)).astype(np.float32)

    for name, a_dt, h_dt in [("bmm_f32", jnp.float32, jnp.float32),
                             ("bmm_bf16", jnp.bfloat16, jnp.bfloat16),
                             ("bmm_mixed", jnp.bfloat16, jnp.float32)]:
        A = jnp.asarray(adj).astype(a_dt)
        x0 = jnp.asarray(h0).astype(h_dt)
        dt = chain(lambda x: jnp.einsum(
            "bnm,bmf->bnf", A, x.astype(a_dt),
            preferred_element_type=jnp.float32).astype(h_dt), x0)
        fl = 2 * B * N * N * F
        print(f"{name:12s} {dt*1e6:8.1f} µs  {fl/dt/1e12:6.2f} TF/s",
              flush=True)

    # upper-bound shapes (NOT GCN-valid; envelope only)
    for name, bb, nn_ in [("bmm_B16_N1024", 16, 1024),
                          ("bmm_B4_N4096", 4, 4096),
                          ("bmm_B1_N16384", 1, 16384)]:
        A = jnp.asarray(rng.normal(size=(bb, nn_, nn_ // 8)).astype(
            np.float32))  # keep FLOPs comparable: n×(n/8) @ (n/8)×F
        x0 = jnp.asarray(rng.normal(size=(bb, nn_ // 8, F)).astype(
            np.float32))
        m_dim = nn_ // 8
        dt = chain(lambda x: jnp.einsum("bnm,bmf->bnf", A, x,
                                        preferred_element_type=jnp.float32
                                        )[:, :m_dim, :], x0, iters=50)
        fl = 2 * bb * nn_ * (nn_ // 8) * F
        print(f"{name:14s} {dt*1e6:8.1f} µs  {fl/dt/1e12:6.2f} TF/s",
              flush=True)

    # flat packed graph: XLA scatter SpMM (gather+segment_sum)
    s_all, r_all = [], []
    for b in range(B):
        s, r = np.nonzero(adj[b])
        s_all.append(s + b * N)
        r_all.append(r + b * N)
    s = jnp.asarray(np.concatenate(s_all).astype(np.int32))
    r = jnp.asarray(np.concatenate(r_all).astype(np.int32))
    E = s.shape[0]
    w = jnp.ones(E, jnp.float32)
    xf = jnp.asarray(h0.reshape(B * N, F))

    dt = chain(lambda x: jax.ops.segment_sum(
        x[s] * w[:, None], r, num_segments=B * N), xf)
    print(f"{'xla_scatter':12s} {dt*1e6:8.1f} µs  ({E} edges, "
          f"{E/dt/1e6:7.1f} M edges/s)", flush=True)

    # banded fused Pallas kernel (sorted by receiver; graphs are 256-node
    # blocks → window 512 satisfies the band contract)
    from tgp_tpu.ops.pallas.segment_spmm import banded_sorted_spmm_pallas

    order = np.argsort(np.asarray(r), kind="stable")
    ss = jnp.asarray(np.asarray(s)[order])
    rs = np.asarray(r)[order]
    ws = jnp.ones(E, jnp.float32)
    row_ptr = jnp.asarray(np.searchsorted(rs, np.arange(B * N + 1)).astype(
        np.int32))
    dt = chain(lambda x: banded_sorted_spmm_pallas(
        x, ss, row_ptr, ws, B * N, window=512), xf)
    print(f"{'pallas_band':12s} {dt*1e6:8.1f} µs  ({E/dt/1e6:7.1f} "
          f"M edges/s)", flush=True)


if __name__ == "__main__":
    main()
