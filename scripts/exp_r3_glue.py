"""Round-3 glue-gap ablation of the flagship dense train step.

BENCH_r02 = 460 µs/step where the 3-matmul chain alone runs at ~46 µs
(RESULTS.md).  Hypotheses, each a variant timed with bench.py's float-sync
dual method (1 blocking call vs 4 queued, diff/(3·STEPS)):

  full            baseline (XLA einsum bmm, f32 feats, adam)
  pallas          bmm_pallas for both conv layers (use_pallas=True)
  pallas_bf16     + compute_dtype=bfloat16
  fwd             forward+loss only (splits fwd vs bwd+opt)
  fwd_pallas      forward with bmm_pallas
  sgd             optax.sgd instead of adam (optimizer cost)
  notopk          score = fixed iota, no top_k sort (top_k cost)
  nogather        pool keeps first-K rows via static slice (gather cost)
"""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

STEPS = 100


def main():
    import jax
    import jax.numpy as jnp
    import optax

    import bench as BB
    from tgp_tpu.graph import DenseGraphBatch, from_graphs, to_dense
    from tgp_tpu.models.fast_dense import DenseTopkClassifier

    graphs, labels = BB.make_graphs()
    batch = from_graphs(graphs)
    dense = to_dense(batch)
    eye = jnp.eye(dense.adj.shape[-1])
    m = dense.mask.astype(jnp.float32)
    adj = dense.adj + eye * m[:, :, None]
    dinv = jax.lax.rsqrt(jnp.clip(adj.sum(-1), 1e-12, None))
    adj = (dinv[..., :, None] * adj * dinv[..., None, :]).astype(jnp.bfloat16)
    dense = DenseGraphBatch(x=dense.x, adj=adj, mask=dense.mask)
    y = jnp.asarray(labels)
    n_edges = int(np.asarray(batch.edge_mask).sum())
    print(f"edges={n_edges}", flush=True)

    def fmedian(f, n=5):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            f()
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[n // 2]

    def timed(one_step, carry, tag):
        def run(n, p, o):
            (p, o), losses = jax.lax.scan(one_step, (p, o), None, length=n)
            return losses[-1]

        run_s = jax.jit(functools.partial(run, STEPS))
        p, o = carry
        t0 = time.perf_counter()
        float(run_s(p, o))
        comp = time.perf_counter() - t0
        t1 = fmedian(lambda: float(run_s(p, o)))
        t4 = fmedian(lambda: float([run_s(p, o) for _ in range(4)][-1]))
        dt = max(t4 - t1, 1e-9) / (3 * STEPS)
        print(f"{tag:14s} {dt*1e6:8.1f} µs/step "
              f"({n_edges/dt/1e6:7.1f} M edges/s)  [compile {comp:.0f}s]",
              flush=True)
        return dt

    def variant(tag, *, opt="adam", train=True, **kw):
        model = DenseTopkClassifier(num_classes=3, hidden=BB.HIDDEN,
                                    ratio=0.5, pre_normalized=True, **kw)
        params = model.init(jax.random.key(0), dense)
        tx = optax.adam(1e-3) if opt == "adam" else optax.sgd(1e-3)
        o0 = tx.init(params)

        def loss_fn(p):
            logits, _ = model.apply(p, dense)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()

        if train:
            def one(carry, _):
                p, o = carry
                l, g = jax.value_and_grad(loss_fn)(p)
                up, o = tx.update(g, o)
                return (optax.apply_updates(p, up), o), l
        else:
            def one(carry, _):
                p, o = carry
                l = loss_fn(p)
                # keep a data dependency so scan can't hoist the step
                return (jax.tree.map(lambda t: t + l * 1e-20, p), o), l
        return timed(one, (params, o0), tag)

    variant("full")
    variant("pallas", use_pallas=True)
    variant("pallas_bf16", use_pallas=True, compute_dtype=jnp.bfloat16)
    variant("bf16", compute_dtype=jnp.bfloat16)
    variant("fwd", train=False)
    variant("fwd_pallas", train=False, use_pallas=True)
    variant("sgd", opt="sgd")


if __name__ == "__main__":
    main()
