"""TVGNN clustering: GTVConv + AsymCheegerCutPool (reference:
examples/clustering_tvgnn.py)."""

from __future__ import annotations

import sys
import time

import jax
import numpy as np
import optax

from tgp_tpu.datasets.csbm import CSBMDataset
from tgp_tpu.graph import from_graphs
from tgp_tpu.models.clustering import ClusteringModel, nmi_score
from tgp_tpu.poolers import get_pooler


def main(epochs: int = 200, hidden: int = 32, seed: int = 0,
         verbose: bool = True):
    ds = CSBMDataset(num_graphs=1, num_nodes=150, num_communities=4,
                     p_in=0.35, p_out=0.03, feature_dim=16, mu=1.2, seed=1)
    x, ei, labels = ds[0]
    batch = from_graphs([(x, ei)])

    pooler = get_pooler("acc", in_channels=hidden, k=4,
                        totvar_coeff=0.785, balance_coeff=0.514)
    model = ClusteringModel(pooler=pooler, hidden=hidden, mp_type="gtv")
    params = model.init(jax.random.key(seed), batch)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            _, out = model.apply(p, batch)
            return out.loss_sum()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    t0 = time.time()
    for epoch in range(epochs):
        params, opt_state, loss = step(params, opt_state)
        if verbose and epoch % 25 == 0:
            print(f"epoch {epoch:04d} loss {float(loss):+.4f}")

    s, _ = model.apply(params, batch)
    pred = np.asarray(s)[0].argmax(-1)[: x.shape[0]]
    nmi = nmi_score(labels, pred)
    if verbose:
        print(f"[tvgnn/acc] NMI {nmi:.3f}  ({time.time()-t0:.1f}s)")
    return nmi


if __name__ == "__main__":
    main()
