"""Node classification via pool → bottleneck → lift (reference:
examples/node_class.py — hierarchical autoencoder with unpooling)."""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tgp_tpu.datasets.csbm import CSBMDataset
from tgp_tpu.graph import from_graphs
from tgp_tpu.models.autoencoder import PoolLiftNodeClassifier
from tgp_tpu.poolers import get_pooler


def main(alias: str = "topk", epochs: int = 100, hidden: int = 32,
         seed: int = 0, verbose: bool = True):
    ds = CSBMDataset(num_graphs=1, num_nodes=160, num_communities=4,
                     p_in=0.3, p_out=0.03, feature_dim=16, mu=1.0, seed=3)
    x, ei, labels = ds[0]
    batch = from_graphs([(x, ei)])
    y = jnp.asarray(labels)
    n = x.shape[0]
    rng = np.random.default_rng(seed)
    train_mask = jnp.asarray(rng.random(n) < 0.5)

    pooler = get_pooler(alias, in_channels=hidden, ratio=0.5, k=8)
    model = PoolLiftNodeClassifier(pooler=pooler, num_classes=4,
                                   hidden=hidden)
    params = model.init(jax.random.key(seed), batch)
    tx = optax.adam(5e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            logits, out = model.apply(p, batch)
            logits = logits[:n]
            ce = optax.softmax_cross_entropy_with_integer_labels(logits, y)
            ce = jnp.where(train_mask, ce, 0.0).sum() / train_mask.sum()
            return ce + out.loss_sum(), logits

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss, logits

    t0 = time.time()
    for epoch in range(epochs):
        params, opt_state, loss, logits = step(params, opt_state)
        if verbose and epoch % 20 == 0:
            acc = float(jnp.mean((jnp.argmax(logits, -1) == y)[~train_mask]))
            print(f"epoch {epoch:04d} loss {float(loss):.4f} val-acc {acc:.3f}")

    logits, _ = model.apply(params, batch)
    acc = float(jnp.mean((jnp.argmax(logits[:n], -1) == y)[~train_mask]))
    if verbose:
        print(f"[{alias}] node-class test acc {acc:.3f} ({time.time()-t0:.1f}s)")
    return acc


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "topk")
