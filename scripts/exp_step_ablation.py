"""Ablate the dense-path train step to locate the 545µs-vs-120µs gap.

Variants (each = ONE compiled scan, timed by the async-queue method):
  full        : fwd+bwd+adam (the bench step)
  fwd         : forward only
  fwd_nopool  : forward, pooling removed (2 GCN + readout)
  fwd_nognn2  : forward, post-pool GCN removed
  full_sgd    : fwd+bwd with plain sgd (isolate adam)
  full_nonorm : fwd+bwd, post GCN uses the raw pooled adjacency
                (no in-step renormalize)
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
    labels = rng.integers(0, 3, size=B).astype(np.int32)
    return graphs, labels


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
    import functools

    def run(p, o):
        (p, o), losses = jax.lax.scan(one_step, (p, o), None, length=STEPS)
        return p, o, losses[-1]

    runj = jax.jit(run)
    p, o = carry
    t0 = time.perf_counter()
    jax.block_until_ready(runj(p, o)[-1])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.block_until_ready(runj(p, o)[-1])
    t_one = time.perf_counter() - t0
    reps = 4
    t0 = time.perf_counter()
    outs = [runj(p, o)[-1] for _ in range(reps)]
    jax.block_until_ready(outs)
    t_many = time.perf_counter() - t0
    return max(t_many - t_one, 1e-9) / ((reps - 1) * STEPS), compile_s


def main():
    graphs, labels = make()
    dense, n_edges = prep(graphs)
    y = jnp.asarray(labels)

    def build(variant):
        post_norm = variant != "full_nonorm"
        model = DenseTopkClassifier(
            num_classes=3, hidden=HIDDEN, ratio=0.5, pre_normalized=True,
            num_post_layers=0 if variant == "fwd_nognn2" else 1,
            post_normalize=post_norm)
        params = model.init(jax.random.key(0), dense)
        tx = (optax.sgd(1e-3) if variant == "full_sgd"
              else optax.adam(1e-3))
        opt = tx.init(params)

        def loss_fn(p):
            logits, _ = model.apply(p, dense)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()

        if variant.startswith("fwd"):
            def one_step(carry, _):
                p, o = carry
                # forward only; fold loss back so the scan carries state
                l = loss_fn(p)
                return (jax.tree_util.tree_map(
                    lambda t: t * (1.0 + 0.0 * l.astype(t.dtype)), p), o), l
        else:
            def one_step(carry, _):
                p, o = carry
                l, grads = jax.value_and_grad(loss_fn)(p)
                updates, o = tx.update(grads, o)
                return (optax.apply_updates(p, updates), o), l
        return one_step, (params, opt)

    # nopool needs a different model: reuse ratio=1.0 (keep everything)
    variants = ["full", "fwd", "fwd_nognn2", "full_sgd", "full_nonorm"]
    for v in variants:
        one_step, carry = build(v)
        dt, comp = timed(one_step, carry)
        print(f"{v:12s}  {dt*1e6:8.1f} µs/step  "
              f"({n_edges/dt/1e6:7.1f} M edges/s, compile {comp:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
