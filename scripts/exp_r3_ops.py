"""Round-3 op-level microbench at flagship shapes (B=64, N=256, K=128,
F=128): which single op eats the forward's ~190 µs of non-matmul time?

Each op is timed in a dependency chain inside one jitted scan (float-sync
dual method).  Candidates:
  topk        jax.lax.top_k over [B, N]
  sort        jnp.sort over [B, N] (lower bound for topk)
  argmax_iter K iterative masked argmaxes (scan) — alternative to sort
  gather1     take_along_axis axis=1: [B,N,N] -> [B,K,N]
  gather2     take_along_axis axis=2: [B,K,N] -> [B,K,K]  (lane gather!)
  onehot      build P [B,K,N] one-hot from idx
  pa          bmm P @ A   (einsum)
  pap         (P @ A) @ P^T (einsum)
  pa_pallas   bmm_pallas P @ A
  eye_norm    post-layer degree renormalization of [B,K,K]
"""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

STEPS = 200
B, N, K, F = 64, 256, 128, 128


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    adj = jnp.asarray((rng.random((B, N, N)) < 0.03).astype(np.float32)
                      ).astype(jnp.bfloat16)
    x = jnp.asarray(rng.normal(size=(B, N, F)).astype(np.float32))
    score0 = jnp.asarray(rng.normal(size=(B, N)).astype(np.float32))
    idx0 = jnp.asarray(
        np.stack([rng.permutation(N)[:K] for _ in range(B)]).astype(np.int32))

    def fmedian(f, n=5):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            f()
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[n // 2]

    def timed(tag, step, init):
        """step: carry -> carry (must keep a data dependency)."""
        def run(n, c):
            c = jax.lax.scan(lambda c, _: (step(c), None), c, None,
                             length=n)[0]
            return jax.tree.leaves(c)[0].reshape(-1)[0].astype(jnp.float32)

        run_s = jax.jit(functools.partial(run, STEPS))
        float(run_s(init))
        t1 = fmedian(lambda: float(run_s(init)))
        t4 = fmedian(lambda: float([run_s(init) for _ in range(4)][-1]))
        dt = max(t4 - t1, 1e-9) / (3 * STEPS)
        print(f"{tag:12s} {dt*1e6:8.2f} µs", flush=True)

    # each step perturbs its carry slightly so the chain can't be hoisted
    timed("topk", lambda s: jax.lax.top_k(s, K)[0] @ jnp.ones((K, N)) * 1e-9
          + s, score0)
    timed("sort", lambda s: jnp.sort(s, axis=-1) * 1e-9 + s, score0)
    timed("gather1",
          lambda a: jnp.concatenate(
              [jnp.take_along_axis(a, idx0[:, :, None], axis=1),
               a[:, K:, :]], axis=1) * jnp.bfloat16(1.0) + a * 0,
          adj)

    def g2(a):
        sub = jnp.take_along_axis(a[:, :K, :], idx0[:, None, :], axis=2)
        return jnp.concatenate(
            [jnp.concatenate([sub, a[:, :K, K:]], axis=2), a[:, K:, :]],
            axis=1)

    timed("gather2", g2, adj)

    def onehot(s):
        i = jax.lax.top_k(s, K)[1]
        P = (i[:, :, None] == jnp.arange(N)[None, None, :]).astype(
            jnp.bfloat16)
        return s + P.sum((1, 2))[:, None] * 1e-9

    timed("topk+onehot", onehot, score0)

    P0 = (idx0[:, :, None] == jnp.arange(N)[None, None, :]).astype(
        jnp.bfloat16)

    timed("pa", lambda a: jnp.concatenate(
        [jnp.einsum("bkn,bnm->bkm", P0, a,
                    preferred_element_type=jnp.bfloat16),
         a[:, K:, :]], axis=1), adj)

    def pap(a):
        pa = jnp.einsum("bkn,bnm->bkm", P0, a,
                        preferred_element_type=jnp.float32)
        sub = jnp.einsum("bkm,bjm->bkj", pa, P0,
                         preferred_element_type=jnp.bfloat16)
        out = jnp.concatenate([sub, a[:, :K, K:]], axis=2)
        return jnp.concatenate([out, a[:, K:, :]], axis=1)

    timed("pap", pap, adj)

    from tgp_tpu.ops.pallas.bmm import bmm_pallas

    def pap_pallas(a):
        pa = bmm_pallas(P0, a)
        sub = bmm_pallas(pa, P0.astype(jnp.float32), False, True)
        out = jnp.concatenate([sub.astype(jnp.bfloat16), a[:, :K, K:]],
                              axis=2)
        return jnp.concatenate([out, a[:, K:, :]], axis=1)

    timed("pap_pallas", pap_pallas, adj)

    def eye_norm(a):
        sub = a[:, :K, :K]
        deg = jnp.clip(jnp.abs(sub).sum(-1), 1e-12, None)
        dinv = jax.lax.rsqrt(deg.astype(jnp.float32)).astype(a.dtype)
        sub = dinv[..., :, None] * sub * dinv[..., None, :]
        out = jnp.concatenate([sub, a[:, :K, K:]], axis=2)
        return jnp.concatenate([out, a[:, K:, :]], axis=1)

    timed("eye_norm", eye_norm, adj)

    # full dense GCN layer matmuls for reference
    w = jnp.asarray(rng.normal(size=(F, F)).astype(np.float32) * 0.05)

    def gcn(xc):
        h = xc @ w
        return jnp.einsum("bnm,bmf->bnf", adj, h.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)

    timed("gcn_layer", gcn, x)


if __name__ == "__main__":
    main()
