"""Instrumented probe of bench.py's timing methodology on the axon tunnel.

Round-2 finding: ``jax.block_until_ready`` on this backend is NOT an
execution barrier (100 train steps "finish" in <10 ms); a device->host
scalar transfer (``float(loss)``) is the only real sync.  This probe
measures, with float-sync everywhere:

  * S=100 vs S=300 scaling (validates execution actually happens),
  * 1-call vs 4-queued difference (cancels RTT),
  * f32 vs bf16 compute_dtype variants,
  * donated vs copied carry.
"""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

import bench as B


def build(compute_dtype=None):
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

    model = DenseTopkClassifier(num_classes=3, hidden=B.HIDDEN, ratio=0.5,
                                pre_normalized=True,
                                compute_dtype=compute_dtype)
    params = model.init(jax.random.key(0), dense)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    def run(n, p, o, data, yy):
        def one_step(carry, _):
            p, o = carry

            def loss_fn(p):
                logits, _ = model.apply(p, data)
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits, yy).mean()

            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, o = tx.update(grads, o)
            return (optax.apply_updates(p, updates), o), loss

        (p, o), losses = jax.lax.scan(one_step, (p, o), None, length=n)
        return p, o, losses[-1]

    n_edges = int(np.asarray(batch.edge_mask).sum())
    return run, params, opt_state, dense, y, n_edges


def fmedian(f, n=5):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        f()
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[n // 2], ts


def main():
    import jax

    for tag, dtype, donate in (("f32", None, False),
                               ("bf16", "bf16", False),
                               ("f32+donate", None, True)):
        import jax.numpy as jnp

        run, params, opt, dense, y, n_edges = build(
            jnp.bfloat16 if dtype else None)
        for steps in (100, 300) if tag == "f32" else (100,):
            kw = dict(donate_argnums=(1, 2)) if donate else {}
            run_s = jax.jit(functools.partial(run, steps), **kw)

            def call():
                out = run_s(params, opt, dense, y)
                return float(out[-1])

            t0 = time.perf_counter()
            v = call()
            print(f"[{tag} S={steps}] compile+run {time.perf_counter()-t0:.1f}s"
                  f" loss={v:.4f}", flush=True)
            if donate:  # donated buffers are consumed — skip repeat timing
                med1, raw1 = fmedian(call, n=3)
                print(f"[{tag} S={steps}] NOTE donated rerun reuses params;"
                      f" med={med1*1e3:.1f}ms raw={[f'{t*1e3:.0f}' for t in raw1]}",
                      flush=True)
                continue
            med1, raw1 = fmedian(call)
            print(f"[{tag} S={steps}] 1-call float-sync med={med1*1e3:.1f}ms "
                  f"raw={[f'{t*1e3:.0f}' for t in raw1]}", flush=True)

            def many():
                outs = [run_s(params, opt, dense, y)[-1] for _ in range(4)]
                return float(outs[-1])

            med4, raw4 = fmedian(many)
            print(f"[{tag} S={steps}] 4-queued med={med4*1e3:.1f}ms "
                  f"raw={[f'{t*1e3:.0f}' for t in raw4]}", flush=True)
            dt = (med4 - med1) / (3 * steps)
            print(f"[{tag} S={steps}] diff-method {dt*1e6:.1f} us/step "
                  f"-> {n_edges/dt/1e6:.1f} M edges/s", flush=True)


if __name__ == "__main__":
    main()
