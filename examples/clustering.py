"""Transductive node clustering with dense poolers (reference:
examples/clustering.py — Cora NMI; here CSBM communities, since downloads
are unavailable).  Supports the ``_u`` unbatched variants.

Run:  python examples/clustering.py [mincut|mincut_u|diff|dmon|jb|acc|...]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tgp_tpu.datasets.csbm import CSBMDataset
from tgp_tpu.graph import from_graphs
from tgp_tpu.models.clustering import ClusteringModel, nmi_score
from tgp_tpu.poolers import get_pooler


def main(alias: str = "mincut", epochs: int = 150, hidden: int = 32,
         seed: int = 0, verbose: bool = True):
    ds = CSBMDataset(num_graphs=1, num_nodes=150, num_communities=4,
                     p_in=0.35, p_out=0.03, feature_dim=16, mu=1.2, seed=1)
    x, ei, labels = ds[0]
    batch = from_graphs([(x, ei)])

    k = 4
    pooler = get_pooler(alias, in_channels=hidden, k=k)
    model = ClusteringModel(pooler=pooler, hidden=hidden)
    rngs = {"params": jax.random.key(seed), "sample": jax.random.key(seed + 1)}
    params = model.init(rngs, batch)
    tx = optax.adam(5e-4)
    opt_state = tx.init(params)

    needs_rng = alias.startswith("bnpool")

    @jax.jit
    def step(params, opt_state, key):
        def loss_fn(p):
            kw = {"rngs": {"sample": key}} if needs_rng else {}
            s, out = model.apply(p, batch, **kw)
            return out.loss_sum()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    t0 = time.time()
    key = jax.random.key(seed + 2)
    for epoch in range(epochs):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, sub)
        if verbose and epoch % 25 == 0:
            print(f"epoch {epoch:04d} loss {float(loss):+.4f}")

    kw = {"rngs": {"sample": jax.random.key(99)}} if needs_rng else {}
    s, out = model.apply(params, batch, **kw)
    s = np.asarray(s)
    if s.ndim == 3:
        pred = s[0].argmax(-1)[: x.shape[0]]
    else:
        pred = s.argmax(-1)[: x.shape[0]]
    nmi = nmi_score(labels, pred)
    if verbose:
        print(f"[{alias}] NMI {nmi:.3f}  ({time.time()-t0:.1f}s)")
    return nmi


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "mincut")
