"""Experiment: SpMM strategy shootout at the flagship bench scale.

Times, on the real TPU, for the bench workload (B=64 ER graphs, 256 nodes,
p=0.03, F=128):
  1. XLA scatter SpMM (current bench path)
  2. XLA gather only
  3. Pallas sorted-CSR segment-sum (current kernel, unfused)
  4. dense per-graph bmm (A as [B, n, n]) — the block-banded limit
  5. fused windowed Pallas kernel (if present)

Methodology: everything inside one jitted lax.fori_loop chain with output
renormalization (see axon notes); per-op time = chain_time / iters.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from tgp_tpu.graph import from_graphs

B, N_PER, P, F = 64, 256, 0.03, 128
ITERS = 500


def make():
    rng = np.random.default_rng(0)
    graphs = []
    for _ in range(B):
        upper = np.triu(rng.random((N_PER, N_PER)) < P, k=1)
        adj = upper | upper.T
        s, r = np.nonzero(adj)
        x = rng.normal(size=(N_PER, F)).astype(np.float32)
        graphs.append((x, np.stack([s, r]).astype(np.int64)))
    return graphs


def chain(fn, x0, iters=ITERS):
    def body(_, x):
        out = fn(x)
        return out * jax.lax.rsqrt(jnp.mean(out * out) + 1e-9)

    return jax.lax.fori_loop(0, iters, body, x0)


def timeit(name, jfn, *args):
    out = jfn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = jfn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:40s} {dt * 1e6:9.1f} us")
    return dt


def main():
    graphs = make()
    b = from_graphs(graphs, sort_edges=True)
    N = b.num_nodes
    E = int(np.asarray(b.edge_mask).sum())
    print(f"N={N} E={E} (padded E={b.num_edges})")
    w = jnp.where(b.edge_mask, b.edge_weight, 0.0)
    x0 = jnp.asarray(np.random.default_rng(1).normal(size=(N, F)),
                     jnp.float32)

    # 1. XLA scatter SpMM
    def spmm_xla(x):
        msgs = x[b.senders] * w[:, None]
        return jax.ops.segment_sum(msgs, b.receivers, num_segments=N)

    timeit("XLA scatter SpMM", jax.jit(lambda x: chain(spmm_xla, x)), x0)

    # 2. gather only
    def gather_only(x):
        g = x[b.senders] * w[:, None]
        return g[:N]

    timeit("XLA gather only", jax.jit(lambda x: chain(gather_only, x)), x0)

    # 3. Pallas unfused
    from tgp_tpu.ops.pallas.segment_spmm import segment_sum_sorted

    def spmm_pallas(x):
        msgs = x[b.senders] * w[:, None]
        return segment_sum_sorted(msgs, b.receivers, N)

    timeit("Pallas sorted segment (unfused)",
           jax.jit(lambda x: chain(spmm_pallas, x)), x0)

    # 4. dense per-graph bmm
    from tgp_tpu.graph import to_dense
    dense = to_dense(b)
    adj = dense.adj

    def spmm_dense(x):
        xb = x.reshape(B, N_PER, F)
        out = jnp.einsum("bnm,bmf->bnf", adj, xb)
        return out.reshape(N, F)

    timeit("dense per-graph bmm", jax.jit(lambda x: chain(spmm_dense, x)), x0)

    def spmm_dense_bf16(x):
        xb = x.reshape(B, N_PER, F).astype(jnp.bfloat16)
        out = jnp.einsum("bnm,bmf->bnf", adj.astype(jnp.bfloat16), xb,
                         preferred_element_type=jnp.float32)
        return out.reshape(N, F)

    timeit("dense per-graph bmm (bf16)",
           jax.jit(lambda x: chain(spmm_dense_bf16, x)), x0)

    # 5. fused windowed Pallas
    from tgp_tpu.ops.pallas.segment_spmm import banded_sorted_spmm_pallas

    counts = jax.ops.segment_sum(jnp.ones(b.num_edges, jnp.int32),
                                 b.receivers, num_segments=N)
    row_ptr = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(counts).astype(jnp.int32)])

    for W in (384, 512):
        def spmm_fused(x, W=W):
            return banded_sorted_spmm_pallas(x, b.senders, row_ptr, w, N,
                                             window=W)

        timeit(f"Pallas fused banded W={W}",
               jax.jit(lambda x: chain(spmm_fused, x)), x0)

    # 0. dispatch baseline: identity chain
    timeit("identity chain (dispatch baseline)",
           jax.jit(lambda x: chain(lambda v: v + 1.0, x)), x0)

    # correctness spot-check on device
    ref = jax.ops.segment_sum(x0[b.senders] * w[:, None], b.receivers,
                              num_segments=N)
    got = banded_sorted_spmm_pallas(x0, b.senders, row_ptr, w, N, window=384)
    err = float(jnp.max(jnp.abs(ref - got)) / (jnp.max(jnp.abs(ref)) + 1e-9))
    print(f"banded rel err vs XLA: {err:.2e}")


if __name__ == "__main__":
    main()
