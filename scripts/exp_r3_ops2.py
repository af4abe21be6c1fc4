"""Round-3 follow-up microbench: feature-row selection variants at flagship
shapes ([B=64, N=256, F=128] -> [B, K=128, F]).

  xgather       take_along_axis axis=1 (current gather_rows forward)
  xgather_vjp   gather_rows fwd+bwd (custom inverse-gather VJP)
  px_default    P @ x one-hot matmul, DEFAULT precision (bf16 truncation)
  px_highest    P @ x one-hot matmul, HIGHEST precision (f32-exact-ish)
  px_vjp        P @ x einsum fwd+bwd (d_x = P^T @ g)
  pap_vjp       adjacency P A P^T fwd+bwd (A, P non-diff: bwd ~ free)
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
    x0 = jnp.asarray(rng.normal(size=(B, N, F)).astype(np.float32))
    idx0 = jnp.asarray(
        np.stack([rng.permutation(N)[:K] for _ in range(B)]).astype(np.int32))
    P_bf = (idx0[:, :, None] == jnp.arange(N)[None, None, :]).astype(
        jnp.bfloat16)
    P_f32 = P_bf.astype(jnp.float32)

    def fmedian(f, n=5):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            f()
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[n // 2]

    def timed(tag, step, init):
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

    def pad_back(sub, x):
        return jnp.concatenate([sub, x[:, K:, :]], axis=1)

    timed("xgather", lambda x: pad_back(
        jnp.take_along_axis(x, idx0[:, :, None], axis=1), x), x0)

    from tgp_tpu.models.fast_dense import gather_rows

    def xg_vjp(x):
        g = jax.grad(lambda xx: jnp.sum(gather_rows(xx, idx0) ** 2))(x)
        return x + g * 1e-9

    timed("xgather_vjp", xg_vjp, x0)

    timed("px_default", lambda x: pad_back(
        jnp.einsum("bkn,bnf->bkf", P_f32, x,
                   preferred_element_type=jnp.float32), x), x0)

    timed("px_highest", lambda x: pad_back(
        jnp.einsum("bkn,bnf->bkf", P_f32, x,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST), x), x0)

    def px_vjp(x):
        g = jax.grad(lambda xx: jnp.sum(
            jnp.einsum("bkn,bnf->bkf", P_f32, xx,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST) ** 2))(x)
        return x + g * 1e-9

    timed("px_vjp", px_vjp, x0)

    # accuracy check of the HIGHEST-precision one-hot selection
    want = np.take_along_axis(np.asarray(x0), np.asarray(idx0)[:, :, None],
                              axis=1)
    got = np.asarray(jnp.einsum("bkn,bnf->bkf", P_f32, x0,
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST))
    err = np.abs(got - want).max() / max(np.abs(want).max(), 1e-12)
    got_d = np.asarray(jnp.einsum("bkn,bnf->bkf", P_f32, x0,
                                  preferred_element_type=jnp.float32))
    err_d = np.abs(got_d - want).max() / max(np.abs(want).max(), 1e-12)
    print(f"one-hot selection rel err: HIGHEST={err:.2e} DEFAULT={err_d:.2e}",
          flush=True)


if __name__ == "__main__":
    main()
