"""Isolate the dense-model bench regression: python-loop vs scan, f32 vs
bf16 adjacency, prenorm vs in-layer norm."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tgp_tpu.graph import DenseGraphBatch, from_graphs, to_dense
from tgp_tpu.models.fast_dense import DenseTopkClassifier

B, N_PER, P, F, HIDDEN, STEPS = 64, 256, 0.03, 128, 128, 30


def make():
    rng = np.random.default_rng(0)
    graphs = []
    for _ in range(B):
        upper = np.triu(rng.random((N_PER, N_PER)) < P, k=1)
        adj = upper | upper.T
        s, r = np.nonzero(adj)
        x = rng.normal(size=(N_PER, F)).astype(np.float32)
        graphs.append((x, np.stack([s, r]).astype(np.int64)))
    labels = rng.integers(0, 3, size=B).astype(np.int32)
    return graphs, labels


def prep(graphs, prenorm, adj_dtype):
    batch = from_graphs(graphs)
    dense = to_dense(batch)
    if prenorm:
        eye = jnp.eye(dense.adj.shape[-1])
        m = dense.mask.astype(jnp.float32)
        adj = dense.adj + eye * m[:, :, None]
        dinv = jax.lax.rsqrt(jnp.clip(adj.sum(-1), 1e-12, None))
        adj = dinv[..., :, None] * adj * dinv[..., None, :]
    else:
        adj = dense.adj
    dense = DenseGraphBatch(x=dense.x, adj=adj.astype(adj_dtype),
                            mask=dense.mask)
    n_edges = int(np.asarray(batch.edge_mask).sum())
    return dense, n_edges


def run_variant(name, graphs, labels, prenorm, adj_dtype, use_scan):
    dense, n_edges = prep(graphs, prenorm, adj_dtype)
    y = jnp.asarray(labels)
    model = DenseTopkClassifier(num_classes=3, hidden=HIDDEN, ratio=0.5,
                                pre_normalized=prenorm)
    params = model.init(jax.random.key(0), dense)
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    def one_step(carry, _):
        p, o = carry

        def loss_fn(p):
            logits, _ = model.apply(p, dense)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()

        loss, grads = jax.value_and_grad(loss_fn)(p)
        up, o = tx.update(grads, o)
        return (optax.apply_updates(p, up), o), loss

    if use_scan:
        @jax.jit
        def run(p, o):
            (p, o), losses = jax.lax.scan(one_step, (p, o), None,
                                          length=STEPS)
            return p, o, losses[-1]

        p, o, l = run(params, opt)
        jax.block_until_ready(l)
        t0 = time.perf_counter()
        p, o, l = run(p, o)
        jax.block_until_ready(l)
        dt = (time.perf_counter() - t0) / STEPS
    else:
        step = jax.jit(lambda p, o: one_step((p, o), None))
        (p, o), l = step(params, opt)
        jax.block_until_ready(l)
        t0 = time.perf_counter()
        for _ in range(STEPS):
            (p, o), l = step(p, o)
        jax.block_until_ready(l)
        dt = (time.perf_counter() - t0) / STEPS
    print(f"{name:45s} {dt * 1e6:9.1f} us/step  {n_edges / dt / 1e6:8.1f} M edges/s")


def main():
    graphs, labels = make()
    run_variant("loop  raw-adj f32 (r1 equivalent)", graphs, labels,
                False, jnp.float32, False)
    run_variant("loop  prenorm f32", graphs, labels, True, jnp.float32, False)
    run_variant("loop  prenorm bf16", graphs, labels, True, jnp.bfloat16,
                False)
    run_variant("scan  prenorm f32", graphs, labels, True, jnp.float32, True)
    run_variant("scan  prenorm bf16", graphs, labels, True, jnp.bfloat16,
                True)


if __name__ == "__main__":
    main()
