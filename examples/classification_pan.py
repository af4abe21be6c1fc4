"""PANConv + PANPooling classification (reference:
examples/classification_pan.py)."""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from tgp_tpu.data.loaders import GraphLoader
from tgp_tpu.datasets.synthetic import SyntheticGraphClassification
from tgp_tpu.mp.gcn import GCNConv
from tgp_tpu.mp.pan import PANConv
from tgp_tpu.poolers import get_pooler
from tgp_tpu.reduce.global_reduce import global_reduce


class PANNet(nn.Module):
    num_classes: int = 3
    hidden: int = 64  # reference example width (classification_pan.py:42)

    @nn.compact
    def __call__(self, batch):
        h, met_deg, met_w, met_dense = PANConv(
            self.hidden, filter_size=3, return_dense_met=True)(batch)
        h = nn.relu(h)
        met_batch = batch.replace(x=h, edge_weight=met_w)
        pooler = get_pooler("pan", in_channels=self.hidden, ratio=0.25)
        # exact full-MET connect (reference SpSpMM semantics)
        out = pooler(met_batch, met_degree=met_deg, met_dense=met_dense)
        g = out.graph
        h = nn.relu(GCNConv(self.hidden)(g, g.x))
        z = global_reduce(h, node_graph=g.node_graph, num_graphs=g.num_graphs,
                          node_mask=g.node_mask, op="sum")
        return nn.Dense(self.num_classes)(nn.relu(nn.Dense(self.hidden)(z)))


def main(epochs: int = 12, verbose: bool = True):
    graphs, labels = SyntheticGraphClassification(
        num_graphs=240, num_features=8, seed=8).generate()
    train = GraphLoader(graphs[:200], labels[:200], batch_size=32,
                        shuffle=True)
    test = GraphLoader(graphs[200:], labels[200:], batch_size=32,
                       pad_nodes=train.pad_nodes, pad_edges=train.pad_edges,
                       max_nodes=train.max_nodes)
    model = PANNet()
    b0, _ = next(iter(train))
    params = model.init(jax.random.key(0), b0)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, batch, y):
        def loss_fn(p):
            logits = model.apply(p, batch)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    t0 = time.time()
    for epoch in range(epochs):
        for batch, y in train:
            params, opt_state, loss = step(params, opt_state, batch,
                                           jnp.asarray(y))

    @jax.jit
    def infer(params, batch):
        return model.apply(params, batch)

    # short batches are padded by cycling graphs — count each test graph
    # exactly once (same dedup as examples/classification.py)
    correct, seen = [], set()
    for batch, y, idx in test._iter_with_indices():
        pred = np.argmax(np.asarray(infer(params, batch)), -1)
        ok = pred == y
        for j, i in enumerate(idx):
            if int(i) not in seen:
                seen.add(int(i))
                correct.append(ok[j])
    acc = float(np.mean(correct))
    if verbose:
        print(f"[pan] test acc {acc:.3f} ({time.time()-t0:.1f}s)")
    return acc


if __name__ == "__main__":
    main()
