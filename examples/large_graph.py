"""Single large-graph training — the sparse pipeline's home regime.

TPU-native counterpart of the reference's batched-small-graph examples:
ONE big receiver-sorted graph driven through GCN → top-k pool → GCN →
readout with the round-5 fast path engaged end-to-end:

* ``from_graphs(sort_edges=True)`` collates static CSR metadata
  (``row_ptr``, the sender-sorted transpose layout, ``in_degree``) so the
  Pallas sorted-CSR SpMM runs with a scatter-free backward;
* ``get_pooler("topk")``'s ``pool_mode="auto"`` uses masked in-place
  pooling — the pooled graph keeps the sorted node space, so the post
  layers stay on the kernel path (62 M edges/s end-to-end at N=64k/E=1M
  on v5e vs 8.5 M for the compact-relabel design; RESULTS.md round 5).

Usage:  python examples/large_graph.py [num_nodes] [avg_degree]
        (defaults 65536 / 15; pass small numbers for a CPU smoke run)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import optax

from tgp_tpu.graph import from_graphs
from tgp_tpu.models.classifiers import PoolingClassifier
from tgp_tpu.poolers import get_pooler


def make_community_graph(n, avg_degree, num_classes=3, feat=64, seed=0):
    """Planted-partition graph: label = community, features = noisy
    community indicator — learnable by one round of message passing."""
    rng = np.random.default_rng(seed)
    com = rng.integers(0, num_classes, n)
    e = n * avg_degree // 2
    s = rng.integers(0, n, e)
    # 70% of edges stay within the community: rewire the receiver to a
    # random member of the sender's community
    same = rng.random(e) < 0.7
    r = rng.integers(0, n, e)
    perm = rng.permutation(n)
    by_com = {c: perm[com[perm] == c] for c in range(num_classes)}
    for c in range(num_classes):
        idx = np.where(same & (com[s] == c))[0]
        r[idx] = rng.choice(by_com[c], size=idx.size)
    ei = np.stack([np.concatenate([s, r]), np.concatenate([r, s])])
    x = np.eye(num_classes, dtype=np.float32)[com]
    x = np.concatenate(
        [x + 0.5 * rng.normal(size=(n, num_classes)).astype(np.float32),
         rng.normal(size=(n, feat - num_classes)).astype(np.float32)], 1)
    y = int(np.bincount(com, minlength=num_classes).argmax())
    return (x, ei), np.asarray([y], np.int32), com


def main(n=65536, avg_degree=15):
    graph, y, _ = make_community_graph(n, avg_degree)
    batch = from_graphs([graph], sort_edges=True)
    n_edges = int(np.asarray(batch.edge_mask).sum())
    print(f"graph: N={batch.num_nodes} E={n_edges} "
          f"(sorted CSR aux: {batch.row_ptr is not None}) "
          f"backend={jax.default_backend()}")

    pooler = get_pooler("topk", in_channels=128, ratio=0.5)
    model = PoolingClassifier(pooler=pooler, num_classes=3, hidden=128,
                              compute_dtype=jnp.bfloat16)
    params = model.init(jax.random.key(0), batch)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    yj = jnp.asarray(y)

    @jax.jit
    def step(p, o, b, yy):
        def loss_fn(p):
            logits, out = model.apply(p, b)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, yy).mean()

        loss, g = jax.value_and_grad(loss_fn)(p)
        up, o = tx.update(g, o)
        return optax.apply_updates(p, up), o, loss

    steps = 30 if n >= 4096 else 5
    t0 = time.perf_counter()
    for i in range(steps):
        params, opt_state, loss = step(params, opt_state, batch, yj)
        if i == 0:
            float(loss)  # compile barrier: timing starts warm
            t0 = time.perf_counter()
    loss = float(loss)
    dt = (time.perf_counter() - t0) / max(steps - 1, 1)
    print(f"loss {loss:.4f}  {dt * 1e3:.1f} ms/step  "
          f"{n_edges / dt / 1e6:.1f} M edges/s")
    return loss


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:3]]
    main(*args)
