"""Precoarsened training (reference: examples/pre_coarsening.py):
PreCoarsening schedules (incl. mixed ndp→graclus), PooledGraphLoader, and a
model applying the reducer level-by-level."""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from tgp_tpu.data.pooled_loader import PooledGraphLoader
from tgp_tpu.datasets.synthetic import SyntheticGraphClassification
from tgp_tpu.mp.gcn import GCNConv
from tgp_tpu.precoarsen import PreCoarsening
from tgp_tpu.reduce.base import base_reduce
from tgp_tpu.reduce.eigenpool import eigenpool_reduce
from tgp_tpu.reduce.global_reduce import global_reduce


class PrecoarsenedNet(nn.Module):
    num_classes: int
    hidden: int = 32
    num_levels: int = 2

    @nn.compact
    def __call__(self, batch, level_batches):
        h = nn.relu(GCNConv(self.hidden)(batch))
        g = batch
        for lb in level_batches:
            # eigen levels carry a [N, H·K] Θ and need the mode-major reduce
            if lb.so.num_modes:
                x_pool = eigenpool_reduce(h, lb.so)
            else:
                x_pool = base_reduce(h, lb.so)
            h = lb.place_features(x_pool)
            g = lb.graph
            h = nn.relu(GCNConv(self.hidden)(g, h))
        z = global_reduce(h, node_graph=g.node_graph, num_graphs=g.num_graphs,
                          node_mask=g.node_mask, op="sum")
        return nn.Dense(self.num_classes)(nn.relu(nn.Dense(self.hidden)(z)))


def main(schedule: str = "graclus", epochs: int = 15, verbose: bool = True):
    graphs, labels = SyntheticGraphClassification(
        num_graphs=240, num_features=8, seed=11).generate()
    if schedule == "mixed":
        tf = PreCoarsening(poolers=[("ndp", {}), ("graclus", {})])
    elif schedule == "eigen":
        # k must shrink level-to-level: pooling a K-node coarse graph into
        # K singleton clusters zeroes Θ (the reference's singleton-cluster
        # quirk writes the self-loop weight, eigenpool_select.py:136-139)
        tf = PreCoarsening(poolers=[("eigen", {"k": 12}),
                                    ("eigen", {"k": 4})])
    else:
        tf = PreCoarsening(poolers=schedule, levels=2)
    t0 = time.time()
    pooled_graphs = [tf(g) for g in graphs]
    if verbose:
        print(f"precoarsened {len(graphs)} graphs in {time.time()-t0:.1f}s")

    n_train = 200
    train = PooledGraphLoader(pooled_graphs[:n_train], labels[:n_train],
                              batch_size=32, shuffle=True)
    test = PooledGraphLoader(pooled_graphs[n_train:], labels[n_train:],
                             batch_size=32)

    model = PrecoarsenedNet(num_classes=3)
    b0, lb0, y0 = next(iter(train))
    params = model.init(jax.random.key(0), b0, lb0)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, batch, lbs, y):
        def loss_fn(p):
            logits = model.apply(p, batch, lbs)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean(), logits

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss, logits

    for epoch in range(epochs):
        accs = []
        for batch, lbs, y in train:
            params, opt_state, loss, logits = step(
                params, opt_state, batch, lbs, jnp.asarray(y))
            accs.append(float(jnp.mean(jnp.argmax(logits, -1) == y)))
        if verbose:
            print(f"epoch {epoch:03d} train-acc {np.mean(accs):.3f}")

    @jax.jit
    def infer(params, batch, lbs):
        return model.apply(params, batch, lbs)

    # short batches cycle graphs — count each test graph exactly once
    correct, seen = [], set()
    for batch, lbs, y, idx in test._iter_with_indices():
        pred = np.argmax(np.asarray(infer(params, batch, lbs)), -1)
        ok = pred == y
        for j, i in enumerate(idx):
            if int(i) not in seen:
                seen.add(int(i))
                correct.append(ok[j])
    acc = float(np.mean(correct))
    if verbose:
        print(f"[{schedule}] precoarsened test acc {acc:.3f}")
    return acc


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "graclus")
