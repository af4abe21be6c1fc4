"""Second ablation round: isolate where the 483 µs fwd+bwd step goes.

  full          : the bench step (fwd+bwd+adam)         [reference point]
  full_nognn2   : without the post-pool GCN
  full_nopre    : without the pre-pool GCN
  full_nopool   : pre GCN -> readout directly (no pooling, no post GCN)
  floor_adam    : loss = ||params||^2 (optimizer + scan floor)
"""

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
    return graphs, rng.integers(0, 3, size=B).astype(np.int32)


def prep(graphs):
    batch = from_graphs(graphs)
    dense = to_dense(batch)
    eye = jnp.eye(dense.adj.shape[-1])
    m = dense.mask.astype(jnp.float32)
    adj = dense.adj + eye * m[:, :, None]
    dinv = jax.lax.rsqrt(jnp.clip(adj.sum(-1), 1e-12, None))
    adj = (dinv[..., :, None] * adj * dinv[..., None, :]).astype(jnp.bfloat16)
    return DenseGraphBatch(x=dense.x, adj=adj, mask=dense.mask), \
        int(np.asarray(batch.edge_mask).sum())


def timed(one_step, carry):
    def run(p, o):
        (p, o), losses = jax.lax.scan(one_step, (p, o), None, length=STEPS)
        return p, o, losses[-1]

    runj = jax.jit(run)
    p, o = carry
    jax.block_until_ready(runj(p, o)[-1])
    t0 = time.perf_counter()
    jax.block_until_ready(runj(p, o)[-1])
    t_one = time.perf_counter() - t0
    reps = 4
    t0 = time.perf_counter()
    outs = [runj(p, o)[-1] for _ in range(reps)]
    jax.block_until_ready(outs)
    t_many = time.perf_counter() - t0
    return max(t_many - t_one, 1e-9) / ((reps - 1) * STEPS)


def main():
    graphs, labels = make()
    dense, n_edges = prep(graphs)
    y = jnp.asarray(labels)

    def variant(name, **kw):
        model = DenseTopkClassifier(num_classes=3, hidden=HIDDEN, ratio=0.5,
                                    pre_normalized=True, **kw)
        params = model.init(jax.random.key(0), dense)
        tx = optax.adam(1e-3)
        opt = tx.init(params)

        def loss_fn(p):
            logits, _ = model.apply(p, dense)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()

        def one_step(carry, _):
            p, o = carry
            l, grads = jax.value_and_grad(loss_fn)(p)
            updates, o = tx.update(grads, o)
            return (optax.apply_updates(p, updates), o), l

        dt = timed(one_step, (params, opt))
        print(f"{name:14s} {dt*1e6:8.1f} µs/step "
              f"({n_edges/dt/1e6:7.1f} M edges/s)", flush=True)

    variant("full")
    variant("full_nognn2", num_post_layers=0)
    variant("full_nopre", num_pre_layers=0)

    # floor: adam + scan, no model
    model = DenseTopkClassifier(num_classes=3, hidden=HIDDEN, ratio=0.5,
                                pre_normalized=True)
    params = model.init(jax.random.key(0), dense)
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    def floor_step(carry, _):
        p, o = carry
        l, grads = jax.value_and_grad(
            lambda p: sum(jnp.sum(t * t) for t in
                          jax.tree_util.tree_leaves(p)))(p)
        updates, o = tx.update(grads, o)
        return (optax.apply_updates(p, updates), o), l

    dt = timed(floor_step, (params, opt))
    print(f"{'floor_adam':14s} {dt*1e6:8.1f} µs/step", flush=True)


if __name__ == "__main__":
    main()
