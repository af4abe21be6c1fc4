"""Itemize the large-graph train step (VERDICT r4 #3 follow-up): where do
146 ms go at N=64k, E=1M, F=128?

HISTORICAL RECORD of the COMPACT-relabel path that motivated the round-5
masked redesign (stages B-E call the compact select/connect internals
directly).  The shipped path is measured by bench.py large_graph and
attributed by scripts/exp_r5_step_trace.py --large (16.1 ms / 62 M
edges/s final).

Measures forward-only and train-step (fwd+bwd+adam) timings for a ladder
of partial models, each adding one stage:

  A  pre-conv GCN only (SpMM fwd/bwd — the 194 M edges/s kernel regime)
  B  A + topk selection (segment ranking over 64k scores)
  C  B + reduce (gather+scatter of kept features)
  D  C + sparse connect (subgraph relabel + coalesce at E=1M)
  E  D + post conv on the pooled graph (unsorted edges -> XLA scatter)
  F  full PoolingClassifier step (bench.py large leg)

Run on TPU:  python scripts/exp_r5_large_step.py
"""

from __future__ import annotations

import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

N, E, F, HIDDEN = 65536, 1_000_000, 128, 128
STEPS = 10


def timed(fn, *args):
    """Median device time per call via the queued-minus-one trick
    (bench.py _timed_scan rationale: float() is the only real sync)."""
    float(np.asarray(fn(*args)).ravel()[0])  # compile+warm

    def median(f, n=5):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            f()
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[n // 2]

    t1 = median(lambda: float(np.asarray(fn(*args)).ravel()[0]))
    reps = 4

    def many():
        outs = [fn(*args) for _ in range(reps)]
        return float(np.asarray(outs[-1]).ravel()[0])

    tm = median(many)
    d = tm - t1
    return d / (reps - 1) if d > 0 else tm / reps


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from tgp_tpu.connect.base import ConnectConfig
    from tgp_tpu.graph import from_graphs
    from tgp_tpu.models.classifiers import PoolingClassifier
    from tgp_tpu.poolers import get_pooler

    cache = ROOT / ".cache" / "jax"
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    rng = np.random.default_rng(7)
    s = rng.integers(0, N, E)
    r = rng.integers(0, N, E)
    x = rng.normal(size=(N, F)).astype(np.float32)
    batch = from_graphs([(x, np.stack([s, r]))], sort_edges=True)

    pooler = get_pooler("topk", in_channels=HIDDEN, ratio=0.5)
    model = PoolingClassifier(pooler=pooler, num_classes=3, hidden=HIDDEN,
                              compute_dtype=jnp.bfloat16)
    params = model.init(jax.random.key(0), batch)
    y = jnp.asarray([1])

    from flax import linen as nn

    from tgp_tpu.mp.gcn import GCNConv
    from tgp_tpu.reduce.base import reduce_sparse
    from tgp_tpu.select.topk import topk_select_from_scores
    from tgp_tpu.connect.base import sparse_connect

    # standalone pieces (own params — the ablation measures time, not
    # trained values); same shapes/kernels as the full model
    conv1 = GCNConv(HIDDEN, dtype=jnp.bfloat16)
    conv2 = GCNConv(HIDDEN, dtype=jnp.bfloat16)
    p1 = conv1.init(jax.random.key(1), batch, batch.x)
    proj = jax.random.normal(jax.random.key(2), (HIDDEN,)) * 0.1

    def stage(upto):
        def fwd(p1, b):
            h = nn.relu(conv1.apply(p1, b, b.x))
            if upto == "A":
                return jnp.sum(h)
            score = jnp.tanh((h.astype(jnp.float32) @ proj)
                             / jnp.maximum(jnp.linalg.norm(proj), 1e-12))
            if upto == "B":
                so = topk_select_from_scores(score, b, 0.5, None)
                return jnp.sum(so.weight)
            so = topk_select_from_scores(score, b, 0.5, None)
            x_pool = reduce_sparse(h, so)
            if upto == "C":
                return jnp.sum(x_pool)
            edges = sparse_connect(b.senders, b.receivers, b.edge_weight,
                                   b.edge_mask, so, ConnectConfig())
            if upto == "D":
                return jnp.sum(edges[2]) + jnp.sum(x_pool)
            from tgp_tpu.graph import GraphBatch

            s_, r_, w_, m_ = edges
            pooled = GraphBatch(
                x=x_pool.astype(h.dtype), senders=s_, receivers=r_,
                edge_weight=w_, edge_mask=m_,
                node_graph=so.cluster_graph, node_pos=so.cluster_pos,
                node_mask=so.out_mask(),
                num_graphs=1, max_nodes=so.max_clusters)
            h2 = nn.relu(conv2.apply(p2, pooled, pooled.x))
            return jnp.sum(h2)

        return fwd

    # init conv2 once on the pooled shape (eager, outside timing)
    def _mk_pooled(b):
        h = nn.relu(conv1.apply(p1, b, b.x))
        score = jnp.tanh((h.astype(jnp.float32) @ proj)
                         / jnp.maximum(jnp.linalg.norm(proj), 1e-12))
        so = topk_select_from_scores(score, b, 0.5, None)
        x_pool = reduce_sparse(h, so)
        s_, r_, w_, m_ = sparse_connect(
            b.senders, b.receivers, b.edge_weight, b.edge_mask, so,
            ConnectConfig())
        from tgp_tpu.graph import GraphBatch

        return GraphBatch(
            x=x_pool.astype(h.dtype), senders=s_, receivers=r_,
            edge_weight=w_, edge_mask=m_, node_graph=so.cluster_graph,
            node_pos=so.cluster_pos, node_mask=so.out_mask(),
            num_graphs=1, max_nodes=so.max_clusters)

    pooled0 = _mk_pooled(batch)
    p2 = conv2.init(jax.random.key(3), pooled0, pooled0.x)

    tx = optax.adam(1e-3)

    def full_step(p, o, b, yy):
        def loss_fn(pp):
            logits, out = model.apply(pp, b)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, yy).mean()

        loss, g = jax.value_and_grad(loss_fn)(p)
        up, o = tx.update(g, o)
        return optax.apply_updates(p, up), o, loss

    print(f"N={N} E={E} F={F} backend={jax.default_backend()}")
    for name in ["A", "B", "C", "D", "E"]:
        fwd = jax.jit(stage(name))
        t_f = timed(fwd, p1, batch)

        def fwd_bwd(pp, b, _fwd=stage(name)):
            return jax.grad(lambda q: _fwd(q, b))(pp)["params"]["bias"]

        t_fb = timed(jax.jit(fwd_bwd), p1, batch)
        print(f"stage {name}: fwd {t_f*1e3:8.2f} ms   fwd+bwd "
              f"{t_fb*1e3:8.2f} ms")

    o0 = tx.init(params)
    step = jax.jit(lambda p, o, b, yy: full_step(p, o, b, yy)[2])
    t_full = timed(step, params, o0, batch, y)
    print(f"stage F (full train step): {t_full*1e3:8.2f} ms   "
          f"({E / t_full / 1e6:.1f} M edges/s)")


if __name__ == "__main__":
    main()
