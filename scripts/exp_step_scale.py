"""Launch-overhead ablation: the compiled train step has ~259 fusions
(≈1.5-2 µs launch each → ~400 µs/step floor at B=64).  Levers:
  flat-adam   : optax.flatten -> ONE fused update for all params
  batch scale : B=256 / B=1024 amortize the fixed launch cost 4x / 16x
Timing: dual-length scans (30 vs 120), median of 3."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tgp_tpu.graph import DenseGraphBatch, from_graphs, to_dense
from tgp_tpu.models.fast_dense import DenseTopkClassifier

N_PER, P, F, HIDDEN = 256, 0.03, 128, 128
SHORT, LONG = 10, 40


def make(B):
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


def timed(make_step, carry, dense, y):
    # dense/y are jit ARGUMENTS (not closure constants) so the big arrays
    # are device buffers, not HLO literals — the remote-compile endpoint
    # rejects large embedded constants with HTTP 413
    def run(n, p, o, dense, y):
        one_step = make_step(dense, y)
        (p, o), losses = jax.lax.scan(one_step, (p, o), None, length=n)
        return losses[-1]

    p, o = carry

    def t_of(n):
        # float() sync — block_until_ready is not a barrier on axon
        f = jax.jit(functools.partial(run, n))
        float(f(p, o, dense, y))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(p, o, dense, y))
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[1]

    return max(t_of(LONG) - t_of(SHORT), 1e-9) / (LONG - SHORT)


def variant(name, B, flat, dtype=None):
    graphs, labels = make(B)
    dense, n_edges = prep(graphs)
    y = jnp.asarray(labels)
    model = DenseTopkClassifier(num_classes=3, hidden=HIDDEN, ratio=0.5,
                                pre_normalized=True, compute_dtype=dtype)
    params = model.init(jax.random.key(0), dense)
    tx = optax.adam(1e-3)
    if flat:
        tx = optax.flatten(tx)
    opt = tx.init(params)

    def make_step(dense, y):
        def loss_fn(p):
            logits, _ = model.apply(p, dense)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()

        def one_step(carry, _):
            p, o = carry
            l, grads = jax.value_and_grad(loss_fn)(p)
            updates, o = tx.update(grads, o)
            return (optax.apply_updates(p, updates), o), l
        return one_step

    dt = timed(make_step, (params, opt), dense, y)
    print(f"{name:22s} {dt*1e6:9.1f} µs/step ({n_edges/dt/1e6:8.1f} "
          f"M edges/s)", flush=True)


if __name__ == "__main__":
    variant("B64", 64, flat=False)
    variant("B64_flat", 64, flat=True)
    variant("B256_flat", 256, flat=True)
    variant("B256_flat_bf16", 256, flat=True, dtype=jnp.bfloat16)
    variant("B1024_flat_bf16", 1024, flat=True, dtype=jnp.bfloat16)
