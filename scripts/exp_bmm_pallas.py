"""TPU experiment: XLA batched GEMM vs the Pallas bmm kernel at the dense
bench shapes ([64,256,256]@[64,256,128] and the pooled [64,128,128] twin),
then the full DenseTopkClassifier train step with each engine.

One process, sequential compiles, data passed as jit arguments (413-proof).
Timing: 1 blocking call vs Q queued calls, difference method (bench.py)."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

REPS = 30


def timed(fn, *args):
    jfn = jax.jit(fn)
    t0 = time.perf_counter()
    jax.block_until_ready(jfn(*args))
    comp = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.block_until_ready(jfn(*args))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    outs = [jfn(*args) for _ in range(REPS)]
    jax.block_until_ready(outs)
    tmany = time.perf_counter() - t0
    return max(tmany - t1, 1e-9) / (REPS - 1), comp


def scan_timed(fn, *args, steps=50):
    """fn(*args) -> arrays; time steps repeats inside one lax.scan program."""
    def run(*a):
        def body(c, _):
            r = fn(*a)
            return c + jax.tree_util.tree_reduce(
                lambda x, y: x + jnp.sum(y.astype(jnp.float32)), r, 0.0), None
        out, _ = jax.lax.scan(body, jnp.float32(0), None, length=steps)
        return out
    dt, comp = timed(run, *args)
    return dt / steps, comp


def main():
    from tgp_tpu.ops.pallas.bmm import bmm_pallas

    rng = np.random.default_rng(0)
    print("devices:", jax.devices(), flush=True)

    for (B, N, F) in [(64, 256, 128), (64, 128, 128)]:
        a = jnp.asarray(rng.normal(size=(B, N, N)).astype(np.float32))
        a16 = a.astype(jnp.bfloat16)
        h = jnp.asarray(rng.normal(size=(B, N, F)).astype(np.float32))
        gf = 2 * B * N * N * F / 1e9
        mb = (a16.nbytes + h.nbytes + B * N * F * 4) / 1e6

        def xla(a, h):
            return jnp.einsum("bnm,bmf->bnf", a, h.astype(a.dtype),
                              preferred_element_type=jnp.float32)

        for name, fn, aa in [
            ("xla_bf16", xla, a16),
            ("xla_f32", lambda a, h: jnp.einsum(
                "bnm,bmf->bnf", a, h, preferred_element_type=jnp.float32), a),
            ("pallas_b8", lambda a, h: bmm_pallas(a, h, block_b=8), a16),
            ("pallas_b16", lambda a, h: bmm_pallas(a, h, block_b=16), a16),
            ("pallas_b4", lambda a, h: bmm_pallas(a, h, block_b=4), a16),
        ]:
            try:
                dt, comp = scan_timed(fn, aa, h)
                print(f"[{B}x{N}x{F}] {name:12s} {dt*1e6:8.1f} us  "
                      f"{gf/dt:7.2f} TF/s  {mb/1e3/dt:7.1f} GB/s  "
                      f"(compile {comp:.0f}s)", flush=True)
            except Exception as e:
                print(f"[{B}x{N}x{F}] {name:12s} FAILED: {e}", flush=True)

    # full train step comparison
    import optax
    from tgp_tpu.graph import DenseGraphBatch, from_graphs, to_dense
    from tgp_tpu.models.fast_dense import DenseTopkClassifier

    graphs = []
    for _ in range(64):
        n = 256
        up = np.triu(rng.random((n, n)) < 0.03, 1)
        adj = up | up.T
        s, r = np.nonzero(adj)
        graphs.append((rng.normal(size=(n, 128)).astype(np.float32),
                       np.stack([s, r]).astype(np.int64)))
    labels = jnp.asarray(rng.integers(0, 3, size=64).astype(np.int32))
    batch = from_graphs(graphs)
    dense = to_dense(batch)
    eye = jnp.eye(dense.adj.shape[-1])
    m = dense.mask.astype(jnp.float32)
    adjn = dense.adj + eye * m[:, :, None]
    dinv = jax.lax.rsqrt(jnp.clip(adjn.sum(-1), 1e-12, None))
    adjn = (dinv[..., :, None] * adjn * dinv[..., None, :]).astype(jnp.bfloat16)
    dense = DenseGraphBatch(x=dense.x, adj=adjn, mask=dense.mask)
    n_edges = int(np.asarray(batch.edge_mask).sum())

    for up_flag in (False, True):
        model = DenseTopkClassifier(num_classes=3, hidden=128, ratio=0.5,
                                    pre_normalized=True, use_pallas=up_flag)
        params = model.init(jax.random.key(0), dense)
        tx = optax.adam(1e-3)
        opt = tx.init(params)

        def step(p, o, d, y):
            def loss_fn(p):
                logits, _ = model.apply(p, d)
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits, y).mean()
            loss, g = jax.value_and_grad(loss_fn)(p)
            up, o = tx.update(g, o)
            return optax.apply_updates(p, up), o, loss

        def run(p, o, d, y, steps=30):
            def body(c, _):
                p, o = c
                p, o, l = step(p, o, d, y)
                return (p, o), l
            (p, o), ls = jax.lax.scan(body, (p, o), None, length=steps)
            return ls[-1]

        dt, comp = timed(run, params, opt, dense, labels)
        dt /= 30
        print(f"full step use_pallas={up_flag}: {dt*1e6:.1f} us/step, "
              f"{n_edges/dt/1e6:.1f} M edges/s (compile {comp:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
