"""Instrumented probe of bench.py's timing methodology on the axon tunnel.

Prints raw per-call wall times for: block_until_ready sync, float() host
transfer sync, 1-call vs 4-queued-calls, and a STEPS-length dependence check
(100 vs 300 steps in the same program shape). Diagnoses whether
block_until_ready is a real barrier on this backend.
"""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

import bench as B


def main():
    import jax

    graphs, labels = B.make_graphs()

    import jax.numpy as jnp
    import optax

    from tgp_tpu.graph import DenseGraphBatch, from_graphs, to_dense
    from tgp_tpu.models.fast_dense import DenseTopkClassifier

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
                                pre_normalized=True)
    params = model.init(jax.random.key(0), dense)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    def one_step(carry, _):
        p, o = carry

        def loss_fn(p):
            logits, _ = model.apply(p, dense_g)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y_g).mean()

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, o = tx.update(grads, o)
        return (optax.apply_updates(p, updates), o), loss

    dense_g, y_g = None, None

    def run(n, p, o, data, yy):
        nonlocal dense_g, y_g
        dense_g, y_g = data, yy
        (p, o), losses = jax.lax.scan(one_step, (p, o), None, length=n)
        return p, o, losses[-1]

    for steps in (100, 300):
        run_s = jax.jit(functools.partial(run, steps))
        t0 = time.perf_counter()
        jax.block_until_ready(run_s(params, opt_state, dense, y)[-1])
        print(f"[S={steps}] compile+run: {time.perf_counter()-t0:.2f}s",
              flush=True)

        # (a) block_until_ready sync, single calls
        for tag, sync in (("block", lambda r: jax.block_until_ready(r)),
                          ("float", lambda r: float(r))):
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                sync(run_s(params, opt_state, dense, y)[-1])
                ts.append(time.perf_counter() - t0)
            print(f"[S={steps}] 1-call {tag}-sync raw:",
                  [f"{t*1e3:.1f}" for t in ts], "ms", flush=True)

        # (b) 4 queued then sync all
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            outs = [run_s(params, opt_state, dense, y)[-1] for _ in range(4)]
            jax.block_until_ready(outs)
            _ = float(outs[-1])
            ts.append(time.perf_counter() - t0)
        print(f"[S={steps}] 4-queued raw:",
              [f"{t*1e3:.1f}" for t in ts], "ms", flush=True)


if __name__ == "__main__":
    main()
