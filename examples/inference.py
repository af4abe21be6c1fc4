"""Train → serve: bucketed batch inference with :class:`Predictor`.

Trains a small classifier (BucketedGraphLoader: per-bucket static padding
budgets), then serves ad-hoc request streams of arbitrary graph sizes
through the Predictor — every request shape lands in a geometric bucket,
so the compiled-executable count stays bounded no matter what arrives.

    python examples/inference.py [pooler_alias]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tgp_tpu.data.loaders import BucketedGraphLoader
from tgp_tpu.datasets.synthetic import SyntheticGraphClassification
from tgp_tpu.models.classifiers import PoolingClassifier
from tgp_tpu.models.inference import Predictor
from tgp_tpu.poolers import get_pooler


def main(alias: str = "topk", epochs: int = 8, hidden: int = 32,
         verbose: bool = True):
    graphs, labels = SyntheticGraphClassification(
        num_graphs=360, num_features=8, seed=42).generate()
    train_g, train_y = graphs[:300], labels[:300]
    test_g, test_y = graphs[300:], labels[300:]

    loader = BucketedGraphLoader(train_g, train_y, batch_size=32,
                                 num_buckets=3, shuffle=True, seed=0)
    pooler = get_pooler(alias, in_channels=hidden, ratio=0.5, k=16)
    model = PoolingClassifier(pooler=pooler, num_classes=3, hidden=hidden)
    first = next(iter(loader))[0]
    params = model.init(jax.random.key(0), first)
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(p, o, b, y):
        def loss_fn(p):
            logits, out = model.apply(p, b)
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits, jnp.asarray(y)).mean()
            return ce + out.loss_sum()

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, o = tx.update(grads, o)
        return optax.apply_updates(p, updates), o, loss

    for ep in range(epochs):
        losses = []
        for b, y in loader:
            params, opt, loss = step(params, opt, b, y)
            losses.append(float(loss))
        if verbose:
            print(f"epoch {ep:03d} loss {np.mean(losses):.4f}")

    # ---- serving: arbitrary-size request stream, bounded compiles -------
    pred = Predictor(lambda p, b: model.apply(p, b)[0], params,
                     batch_size=8)
    t0 = time.time()
    logits = pred(test_g)
    acc = float((logits.argmax(-1) == test_y).mean())
    if verbose:
        print(f"served {len(test_g)} graphs in {time.time()-t0:.2f}s "
              f"({pred.num_compiled} compiled shapes), test acc {acc:.3f}")
        # second wave: same size distribution → pure cache hits
        before = pred.num_compiled
        pred(test_g[::-1])
        print(f"second wave: {pred.num_compiled - before} new compiles")
    return acc


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "topk")
