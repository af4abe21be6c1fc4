"""Skew-story bench (VERDICT r4 #8): GraphLoader (single global padding
budget) vs BucketedGraphLoader (per-bucket budgets) on a power-law-sized
synthetic dataset, end-to-end through the real train step.

Reports, per loader: padding waste (dead node/edge slot fraction), number
of distinct compiled shapes, cold first-epoch time (compiles), and warm
epoch wall-clock.  Committed table lives in RESULTS.md round 5.

Run on TPU:   python scripts/exp_r5_skew_bench.py
Run on CPU:   python scripts/exp_r5_skew_bench.py --cpu [--small]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def make_powerlaw_dataset(num_graphs=384, n_min=20, n_max=1500,
                          alpha=1.8, feat=32, seed=0):
    """Graph sizes from a truncated Pareto (power-law) — a few hub graphs
    dominate the global padding budget; ER edges at constant avg degree."""
    rng = np.random.default_rng(seed)
    u = rng.random(num_graphs)
    sizes = (n_min * (1 - u) ** (-1.0 / alpha)).astype(int)
    sizes = np.clip(sizes, n_min, n_max)
    graphs, labels = [], []
    for n in sizes:
        deg = 6.0
        e = max(int(deg * n / 2), 1)
        s = rng.integers(0, n, e)
        r = rng.integers(0, n, e)
        keep = s != r
        ei = np.stack([np.concatenate([s[keep], r[keep]]),
                       np.concatenate([r[keep], s[keep]])])
        x = rng.normal(size=(n, feat)).astype(np.float32)
        graphs.append((x, ei))
        labels.append(int(n % 3))  # size-correlated labels: learnable
    return graphs, np.asarray(labels, np.int32), sizes


def run_loader(loader, model, params0, tx, epochs=3):
    import jax
    import jax.numpy as jnp
    import optax

    @jax.jit
    def train_step(params, opt_state, batch, y):
        def loss_fn(p):
            logits, out = model.apply(p, batch)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean() + out.loss_sum()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    params = params0
    opt_state = tx.init(params)

    # padding-waste accounting + shape census over one pass
    shapes = set()
    node_slots = node_real = edge_slots = edge_real = 0
    for batch, y in loader:
        shapes.add((batch.num_nodes, batch.num_edges, batch.max_nodes))
        node_slots += batch.num_nodes
        node_real += int(np.asarray(batch.node_mask).sum())
        edge_slots += batch.num_edges
        edge_real += int(np.asarray(batch.edge_mask).sum())

    times = []
    for ep in range(epochs):
        t0 = time.perf_counter()
        last = None
        for batch, y in loader:
            params, opt_state, last = train_step(
                params, opt_state, batch, jnp.asarray(y))
        float(last)  # device→host sync (the only real barrier on axon)
        times.append(time.perf_counter() - t0)

    return {
        "distinct_shapes": len(shapes),
        "node_pad_waste_pct": round(100 * (1 - node_real / node_slots), 1),
        "edge_pad_waste_pct": round(100 * (1 - edge_real / edge_slots), 1),
        "cold_epoch_s": round(times[0], 2),
        "warm_epoch_s": round(min(times[1:]) if len(times) > 1
                              else times[0], 3),
        "batches_per_epoch": len(loader),
    }


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--buckets", type=int, default=4)
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import optax

    from tgp_tpu.data.loaders import BucketedGraphLoader, GraphLoader
    from tgp_tpu.models.classifiers import PoolingClassifier
    from tgp_tpu.poolers import get_pooler

    if args.small:
        graphs, labels, sizes = make_powerlaw_dataset(
            num_graphs=64, n_max=300, feat=8)
        hidden, bs = 16, 16
    else:
        graphs, labels, sizes = make_powerlaw_dataset()
        hidden, bs = 64, 32
    print(f"dataset: {len(graphs)} graphs, sizes p50={np.median(sizes):.0f} "
          f"p90={np.percentile(sizes, 90):.0f} max={sizes.max()}")

    pooler = get_pooler("topk", in_channels=hidden, ratio=0.5)
    model = PoolingClassifier(pooler=pooler, num_classes=3, hidden=hidden)

    flat = GraphLoader(graphs, labels, batch_size=bs, shuffle=True, seed=0)
    bucketed = BucketedGraphLoader(graphs, labels, batch_size=bs,
                                   num_buckets=args.buckets, shuffle=True,
                                   seed=0)
    b0, _ = next(iter(flat))
    params0 = model.init(jax.random.key(0), b0)
    tx = optax.adam(1e-3)

    out = {}
    for name, loader in (("GraphLoader", flat),
                         ("BucketedGraphLoader", bucketed)):
        out[name] = run_loader(loader, model, params0, tx,
                               epochs=args.epochs)
        print(name, json.dumps(out[name]))
    speedup = (out["GraphLoader"]["warm_epoch_s"]
               / out["BucketedGraphLoader"]["warm_epoch_s"])
    print(f"bucketed warm-epoch speedup: {speedup:.2f}x")


if __name__ == "__main__":
    main()
