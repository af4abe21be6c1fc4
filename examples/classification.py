"""Graph classification example (reference: examples/classification.py).

Trains a GCN → pooler → GCN → readout classifier.  Datasets:

    python examples/classification.py topk                       # synthetic
    python examples/classification.py topk --dataset PROTEINS \
        --data-dir data/tu                                       # TU format
    python examples/classification.py topk --dataset gcb \
        --data-dir data/gcb                                      # GCB npz
    python examples/classification.py topk --dataset expwl1 \
        --data-dir data/expwl1                                   # EXPWL1 npz

TU datasets (PROTEINS/NCI1/…) run the moment the raw text files are
mounted under ``--data-dir`` (BASELINE.md configs 1-2).
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tgp_tpu.data.loaders import GraphLoader
from tgp_tpu.datasets.synthetic import SyntheticGraphClassification
from tgp_tpu.graph import DenseGraphBatch
from tgp_tpu.models.classifiers import PoolingClassifier
from tgp_tpu.models.prepare import prepare_batch
from tgp_tpu.poolers import get_pooler


#: which pipeline the last `main()` run took ("dense" | "sparse") — set by
#: the prepare_batch regime dispatch, asserted by the smoke test
LAST_ROUTE = None


def load_dataset(dataset: str, data_dir: str | None):
    """Return ``(graphs, labels, num_classes)`` for a named dataset."""
    if dataset == "synthetic":
        graphs, labels = SyntheticGraphClassification(
            num_graphs=360, num_features=8, seed=42).generate()
        return graphs, labels, 3
    if dataset == "gcb":
        from tgp_tpu.datasets import GraphClassificationBench

        tr_g, tr_y = GraphClassificationBench(
            root=data_dir, split="train").load()
        te_g, te_y = GraphClassificationBench(
            root=data_dir, split="test").load()
        import numpy as _np

        return tr_g + te_g, _np.concatenate([tr_y, te_y]), \
            int(max(tr_y.max(), te_y.max())) + 1
    if dataset == "expwl1":
        from tgp_tpu.datasets import EXPWL1Dataset

        g, y = EXPWL1Dataset(root=data_dir).load()
        return g, y, int(y.max()) + 1
    # anything else: a TU dataset name (PROTEINS, NCI1, MUTAG, …)
    from tgp_tpu.datasets import TUDataset

    ds = TUDataset(root=data_dir or "data/tu", name=dataset)
    g, y = ds.load()
    return g, y, ds.num_classes


def main(alias: str = "topk", epochs: int = 20, batch_size: int = 32,
         hidden: int = 64, seed: int = 0, verbose: bool = True,
         checkpoint_dir: str | None = None, dataset: str = "synthetic",
         data_dir: str | None = None):
    graphs, labels, num_classes = load_dataset(dataset, data_dir)
    n_train = int(0.85 * len(graphs)) if dataset != "synthetic" else 300
    # shared padding budgets so train and eval run one compiled program:
    # elementwise max over both splits' worst cases (each split cycles its
    # own graphs when shorter than a batch)
    from tgp_tpu.data.loaders import compute_budgets

    b_tr = compute_budgets(graphs[:n_train], batch_size)
    b_te = compute_budgets(graphs[n_train:], batch_size)
    pad_nodes, pad_edges, max_nodes = (max(a, b) for a, b in zip(b_tr, b_te))
    train_loader = GraphLoader(graphs[:n_train], labels[:n_train],
                               batch_size=batch_size, shuffle=True, seed=seed,
                               pad_nodes=pad_nodes, pad_edges=pad_edges,
                               max_nodes=max_nodes)
    test_loader = GraphLoader(graphs[n_train:], labels[n_train:],
                              batch_size=batch_size,
                              pad_nodes=pad_nodes,
                              pad_edges=pad_edges,
                              max_nodes=max_nodes)

    pooler = get_pooler(alias, in_channels=hidden, ratio=0.5, k=16)

    # model-level regime dispatch (tgp_tpu/models/prepare.py): densify a
    # batch ONCE on the way into the jitted step when the measured regime
    # map says the scatter-free dense pipeline wins for this pooler at
    # this (B, Nmax) — at the flagship shape this is ~90× faster than the
    # sparse scatter pipeline; sparse-only poolers pass through unchanged.
    # GCN-pre-normalization is applied only for score-based poolers (topk):
    # the dense cluster family computes its losses on the RAW adjacency
    # (reference semantics), so its batches keep A and the MP layers
    # normalize internally.
    from tgp_tpu.src import DenseSRCPooling

    norm_ok = not isinstance(pooler, DenseSRCPooling)

    def prep(b):
        return prepare_batch(b, pooler=pooler, normalize=norm_ok)

    batch0, y0 = next(iter(train_loader))
    batch0 = prep(batch0)
    dense_route = isinstance(batch0, DenseGraphBatch)
    global LAST_ROUTE  # test probe (tests/test_examples_smoke.py)
    LAST_ROUTE = "dense" if dense_route else "sparse"
    model = PoolingClassifier(pooler=pooler, num_classes=num_classes,
                              hidden=hidden,
                              pre_normalized=dense_route and norm_ok)
    if verbose:
        print(f"[{alias}] pipeline: {LAST_ROUTE}")
    # stochastic poolers (BNPool's reparameterized Beta sampling) draw from
    # a "sample" PRNG stream — thread it like the reference threads
    # torch.Generator state
    needs_sample = alias.startswith("bnpool")
    init_rngs = {"params": jax.random.key(seed)}
    if needs_sample:
        init_rngs["sample"] = jax.random.key(seed + 1)
    params = model.init(init_rngs, batch0)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    def _rngs(key):
        return {"sample": key} if needs_sample else None

    @jax.jit
    def train_step(params, opt_state, batch, y, key):
        def loss_fn(p):
            logits, out = model.apply(p, batch, rngs=_rngs(key))
            ce = optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()
            return ce + out.loss_sum(), logits

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        acc = jnp.mean(jnp.argmax(logits, -1) == y)
        return params, opt_state, loss, acc

    @jax.jit
    def eval_step(params, batch, y, key):
        logits, _ = model.apply(params, batch, rngs=_rngs(key))
        return jnp.argmax(logits, -1) == y

    t0 = time.time()
    key = jax.random.key(seed + 2)
    for epoch in range(epochs):
        losses, accs = [], []
        for batch, y in train_loader:
            key, sub = jax.random.split(key)
            params, opt_state, loss, acc = train_step(
                params, opt_state, prep(batch), jnp.asarray(y), sub)
            losses.append(float(loss))
            accs.append(float(acc))
        if verbose:
            print(f"epoch {epoch:03d} loss {np.mean(losses):.4f} "
                  f"train-acc {np.mean(accs):.3f}")

    correct, seen = [], set()
    for batch, y, idx in test_loader._iter_with_indices():
        key, sub = jax.random.split(key)
        ok = np.asarray(eval_step(params, prep(batch), jnp.asarray(y), sub))
        for j, i in enumerate(idx):
            # short batches are padded by cycling graphs — count each test
            # graph exactly once
            if i not in seen:
                seen.add(int(i))
                correct.append(ok[j])
    test_acc = float(np.mean(correct))
    if verbose:
        print(f"[{alias}] test acc {test_acc:.3f}  ({time.time()-t0:.1f}s)")

    if checkpoint_dir:
        from tgp_tpu.utils.checkpoint import restore_params, save_params

        save_params(checkpoint_dir, params)
        restored = restore_params(checkpoint_dir, like=params)
        ck = _rngs(jax.random.key(123))
        logits_a, _ = model.apply(params, batch0, rngs=ck)
        logits_b, _ = model.apply(restored, batch0, rngs=ck)
        assert np.allclose(np.asarray(logits_a), np.asarray(logits_b))
        if verbose:
            print(f"checkpoint round-trip OK → {checkpoint_dir}")
    return test_acc


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("alias", nargs="?", default="topk")
    ap.add_argument("--dataset", default="synthetic",
                    help="synthetic | gcb | expwl1 | any TU name "
                         "(PROTEINS, NCI1, …)")
    ap.add_argument("--data-dir", default=None)
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--hidden", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--checkpoint-dir", default=None)
    a = ap.parse_args()
    main(a.alias, epochs=a.epochs, batch_size=a.batch_size, hidden=a.hidden,
         seed=a.seed, checkpoint_dir=a.checkpoint_dir, dataset=a.dataset,
         data_dir=a.data_dir)
