"""Honest (float-sync) ablation of the dense flagship train step.

Variants, all timed with the dual 1-vs-4-queued diff at S=100:
  full        — the bench step (fwd+bwd+adam)
  fwd         — forward + loss only
  nopool      — two GCN layers on the full graph, no pooling (fwd+bwd)
  nopost      — pre GCN + pool + readout, no post GCN (fwd+bwd)
  bmm2        — just the two forward bmms chained (pure MXU/HBM envelope)
  bmm2_bwd    — the two bmms with backward
"""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

import bench as B

STEPS = 100


def fmedian(f, n=5):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        f()
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[n // 2]


def timed(run, *args):
    import jax

    run_s = jax.jit(functools.partial(run, STEPS))
    t0 = time.perf_counter()
    float(run_s(*args)[-1])
    compile_s = time.perf_counter() - t0
    t1 = fmedian(lambda: float(run_s(*args)[-1]))
    t4 = fmedian(lambda: float([run_s(*args)[-1] for _ in range(4)][-1]))
    dt = (t4 - t1) / (3 * STEPS)
    return dt, compile_s


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from tgp_tpu.graph import DenseGraphBatch, from_graphs, to_dense
    from tgp_tpu.models.fast_dense import DenseTopkClassifier

    graphs, labels = B.make_graphs()
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
    tx = optax.adam(1e-3)

    def make_model(**kw):
        kw.setdefault("ratio", 0.5)
        model = DenseTopkClassifier(num_classes=3, hidden=B.HIDDEN,
                                    pre_normalized=True, **kw)
        params = model.init(jax.random.key(0), dense)
        return model, params, tx.init(params)

    def train_run(model):
        def run(n, p, o, data, yy):
            def one(carry, _):
                p, o = carry

                def loss_fn(p):
                    logits, _ = model.apply(p, data)
                    return optax.softmax_cross_entropy_with_integer_labels(
                        logits, yy).mean()

                loss, grads = jax.value_and_grad(loss_fn)(p)
                up, o = tx.update(grads, o)
                return (optax.apply_updates(p, up), o), loss
            (p, o), losses = jax.lax.scan(one, (p, o), None, length=n)
            return p, o, losses[-1]
        return run

    def fwd_run(model):
        def run(n, p, o, data, yy):
            def one(s, _):
                logits, _ = model.apply(p, data)
                loss = optax.softmax_cross_entropy_with_integer_labels(
                    logits, yy).mean()
                return s + loss * 1e-6, loss
            s, losses = jax.lax.scan(one, jnp.float32(0), None, length=n)
            return s, losses[-1]
        return run

    def case_model(name, runner, **kw):
        def build():
            m, p, o = make_model(**kw)
            return runner(m), (p, o, dense, y)
        return (name, build)

    cases = [
        case_model("full", train_run),
        case_model("fwd", fwd_run),
        case_model("nopool(r=1)", train_run, ratio=1.0),
        case_model("nopost", train_run, num_post_layers=0),
        case_model("bf16", train_run, compute_dtype=jnp.bfloat16),
    ]

    # pure bmm chains
    w1 = jax.random.normal(jax.random.key(1), (B.F, B.HIDDEN)) * 0.05

    def bmm2_run(n, p, o, data, yy):
        def one(h, _):
            xw = h @ p                                  # [B,N,H]
            out = jnp.einsum("bnm,bmf->bnf", data.adj.astype(jnp.float32),
                             xw)
            h2 = jnp.tanh(out @ p.T * 1e-2)
            return h2, jnp.float32(0)
        h, _ = jax.lax.scan(one, data.x, None, length=n)
        return None, None, h.sum()

    def bmm2_bwd_run(n, p, o, data, yy):
        def one(p, _):
            def loss_fn(p):
                xw = data.x @ p
                out = jnp.einsum("bnm,bmf->bnf",
                                 data.adj.astype(jnp.float32), xw)
                return jnp.sum(out ** 2) * 1e-9
            l, g = jax.value_and_grad(loss_fn)(p)
            return p - 1e-6 * g, l
        p, ls = jax.lax.scan(one, p, None, length=n)
        return None, None, ls[-1]

    cases.append(("bmm2", lambda: (bmm2_run, (w1, None, dense, y))))
    cases.append(("bmm2_bwd", lambda: (bmm2_bwd_run, (w1, None, dense, y))))

    for name, build in cases:
        try:
            run, args = build()
            dt, cs = timed(run, *args)
            print(f"{name:12s} {dt*1e6:7.1f} us/step  "
                  f"{n_edges/dt/1e6:7.1f} M edges/s  (compile {cs:.1f}s)",
                  flush=True)
        except Exception as e:
            print(f"{name:12s} FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
