"""Does exploiting adjacency symmetry in the GCN backward help?

The dense GCN layer is ``out = adj @ (x @ W)`` with a *symmetric*
GCN-normalized adjacency.  XLA's autodiff computes ``d_xw = adjᵀ @ g``;
if that transpose is materialized (8 MB bf16 per layer per step), a
custom VJP that reuses ``adj`` (symmetric) saves the pass.  Measure the
full train step with and without the symmetric VJP, float-synced.
"""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
import optax

import bench as B
from tgp_tpu.graph import DenseGraphBatch, from_graphs, to_dense

STEPS = 100


@jax.custom_vjp
def sym_bmm(adj, h):
    return jnp.einsum("bnm,bmf->bnf", adj, h,
                      preferred_element_type=jnp.float32)


def _sym_fwd(adj, h):
    return sym_bmm(adj, h), (adj, h)


def _sym_bwd(res, g):
    adj, h = res
    # adjᵀ = adj (symmetric): reuse the same operand, no transpose pass
    d_h = jnp.einsum("bnm,bmf->bnf", adj, g.astype(adj.dtype),
                     preferred_element_type=jnp.float32)
    # adj is data (not trained): zero cotangent, skip the g @ hᵀ matmul
    return jnp.zeros_like(adj), d_h


sym_bmm.defvjp(_sym_fwd, _sym_bwd)


def build():
    graphs, labels = B.make_graphs()
    batch = from_graphs(graphs)
    dense = to_dense(batch)
    eye = jnp.eye(dense.adj.shape[-1])
    m = dense.mask.astype(jnp.float32)
    adj = dense.adj + eye * m[:, :, None]
    dinv = jax.lax.rsqrt(jnp.clip(adj.sum(-1), 1e-12, None))
    adj = (dinv[..., :, None] * adj * dinv[..., None, :]).astype(jnp.bfloat16)
    x = dense.x
    mask = dense.mask
    y = jnp.asarray(labels)
    n_edges = int(np.asarray(batch.edge_mask).sum())
    return x, adj, mask, y, n_edges


def make_model(mm):
    """Minimal GCN->topk->GCN->readout with a pluggable adj matmul."""
    import math

    H = B.HIDDEN

    def init(key):
        ks = jax.random.split(key, 6)
        g = jax.nn.initializers.glorot_uniform()
        bound = 1 / math.sqrt(H)
        return {
            "W1": g(ks[0], (B.F, H)), "b1": jnp.zeros(H),
            "p": jax.random.uniform(ks[1], (H,), minval=-bound, maxval=bound),
            "W2": g(ks[2], (H, H)), "b2": jnp.zeros(H),
            "W3": g(ks[3], (H, H)), "b3": jnp.zeros(H),
            "Wh": g(ks[4], (H, 3)), "bh": jnp.zeros(3),
        }

    def fwd(p, x, adj, mask, y):
        h = jax.nn.relu(mm(adj, x @ p["W1"]) + p["b1"])
        score = jnp.tanh((h @ p["p"])
                         / jnp.maximum(jnp.linalg.norm(p["p"]), 1e-12))
        N = x.shape[1]
        K = N // 2
        ranked = jnp.where(mask, score, jnp.finfo(score.dtype).min)
        top, idx = jax.lax.top_k(ranked, K)
        hk = jnp.take_along_axis(h, idx[..., None], axis=1) * top[..., None]
        adjk = jnp.take_along_axis(adj, idx[:, :, None], axis=1)
        adjk = jnp.take_along_axis(adjk, idx[:, None, :], axis=2)
        h2 = jax.nn.relu(mm(adjk, hk @ p["W2"]) + p["b2"])
        z = jnp.sum(h2, axis=1)
        z = jax.nn.relu(z @ p["W3"] + p["b3"])
        logits = z @ p["Wh"] + p["bh"]
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, y).mean()

    return init, fwd


def timed(fwd, params, tx, opt, x, adj, mask, y):
    def run(n, p, o, x, adj, mask, y):
        def one(carry, _):
            p, o = carry
            l, g = jax.value_and_grad(fwd)(p, x, adj, mask, y)
            up, o = tx.update(g, o)
            return (optax.apply_updates(p, up), o), l
        (p, o), ls = jax.lax.scan(one, (p, o), None, length=n)
        return ls[-1]

    f = jax.jit(functools.partial(run, STEPS))
    float(f(params, opt, x, adj, mask, y))

    def t1():
        t0 = time.perf_counter()
        float(f(params, opt, x, adj, mask, y))
        return time.perf_counter() - t0

    def t4():
        t0 = time.perf_counter()
        outs = [f(params, opt, x, adj, mask, y) for _ in range(4)]
        float(outs[-1])
        return time.perf_counter() - t0

    m1 = sorted(t1() for _ in range(5))[2]
    m4 = sorted(t4() for _ in range(5))[2]
    return (m4 - m1) / (3 * STEPS)


def main():
    x, adj, mask, y, n_edges = build()
    tx = optax.adam(1e-3)
    for name, mm in (
        ("xla_autodiff", lambda a, h: jnp.einsum(
            "bnm,bmf->bnf", a, h, preferred_element_type=jnp.float32)),
        ("symmetric_vjp", sym_bmm),
    ):
        init, fwd = make_model(mm)
        params = init(jax.random.key(0))
        opt = tx.init(params)
        dt = timed(fwd, params, tx, opt, x, adj, mask, y)
        print(f"{name:14s} {dt*1e6:7.1f} us/step  "
              f"{n_edges/dt/1e6:7.1f} M edges/s", flush=True)


if __name__ == "__main__":
    main()
