"""Isolate the pooled-adjacency pathology: the [B,K,K] post-pool bmm costs
~1 ms when its operand is a double take_along_axis of the [B,N,N] input
(XLA fuses the gathers into the dot).  Compare:
  baseline   : gather-gather -> bmm (current fast_dense)
  barrier    : optimization_barrier between gathers and bmm
  onehot     : adj_pool = P A P^T via two bmms (gather AS matmul, MXU)
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

B, N, K, F = 64, 256, 128, 128
REPS = 20


def timed(fn, *args):
    jfn = jax.jit(fn)
    jax.block_until_ready(jfn(*args))
    t0 = time.perf_counter()
    jax.block_until_ready(jfn(*args))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    outs = [jfn(*args) for _ in range(REPS)]
    jax.block_until_ready(outs)
    tm = time.perf_counter() - t0
    return (tm - t1) / (REPS - 1)


def main():
    rng = np.random.default_rng(0)
    adj = jnp.asarray(
        (rng.random((B, N, N)) < 0.03).astype(np.float32)).astype(
            jnp.bfloat16)
    h = jnp.asarray(rng.normal(size=(B, K, F)).astype(np.float32))
    idx = jnp.asarray(
        np.stack([rng.permutation(N)[:K] for _ in range(B)]).astype(
            np.int32))

    def gathered(adj, idx):
        a = jnp.take_along_axis(adj, idx[:, :, None], axis=1)
        return jnp.take_along_axis(a, idx[:, None, :], axis=2)

    def baseline(adj, idx, h):
        ap = gathered(adj, idx)
        return jnp.einsum("bkj,bjf->bkf", ap.astype(h.dtype), h).sum()

    def barrier(adj, idx, h):
        ap = jax.lax.optimization_barrier(gathered(adj, idx))
        return jnp.einsum("bkj,bjf->bkf", ap.astype(h.dtype), h).sum()

    def onehot(adj, idx, h):
        P = jax.nn.one_hot(idx, N, dtype=adj.dtype)  # [B, K, N]
        ap = jnp.einsum("bkn,bnm,bjm->bkj", P, adj, P)
        return jnp.einsum("bkj,bjf->bkf", ap.astype(h.dtype), h).sum()

    def gather_only(adj, idx):
        return gathered(adj, idx).astype(jnp.float32).sum()

    def bmm_only(adj, h):
        return jnp.einsum("bkj,bjf->bkf",
                          adj[:, :K, :K].astype(h.dtype), h).sum()

    for name, fn, args in [
        ("gather_only", gather_only, (adj, idx)),
        ("bmm_only", bmm_only, (adj, h)),
        ("baseline", baseline, (adj, idx, h)),
        ("barrier", barrier, (adj, idx, h)),
        ("onehot", onehot, (adj, idx, h)),
    ]:
        dt = timed(fn, *args)
        print(f"{name:12s} {dt*1e6:9.1f} µs", flush=True)


if __name__ == "__main__":
    main()
