"""Profiler-based per-op attribution of the dense flagship train step
(VERDICT r4 #5): replace the >100%-of-HBM cost-analysis bound with a
measured on-chip trace whose rows sum to the step time.

Method: jit the exact bench.py flagship program (the ``lax.scan`` over
train steps at B=64, N=256, F=H=128), run ONE compiled call under
``jax.profiler.trace``, and aggregate the device-side HLO events from the
Chrome-trace export.  Each row reports measured time, achieved HBM GB/s
(= bytes_accessed/dur — exact per-op, unlike the whole-step cost-analysis
ratio that double-counts VMEM-resident reuse), and achieved TF/s.

Run on TPU:  python scripts/exp_r5_step_trace.py [--steps 50]
             python scripts/exp_r5_step_trace.py --large [--steps 10]
                 (traces bench.py's large_graph leg instead: one sorted
                  N=64k / E=1M graph through the sparse pipeline)
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import sys
import tempfile
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import bench as B  # noqa: E402  (workload constants + graph builder)


def build_step(steps):
    """The bench_jax flagship program: scan of (fwd+bwd+adam) over the
    dense top-k classifier, identical preprocessing (bench.py:83-100)."""
    import jax
    import jax.numpy as jnp
    import optax

    from tgp_tpu.graph import DenseGraphBatch, from_graphs, to_dense
    from tgp_tpu.models.fast_dense import DenseTopkClassifier

    graphs, labels = B.make_graphs()
    batch = from_graphs(graphs)
    dense = to_dense(batch)
    eye = jnp.eye(dense.adj.shape[-1])
    m = dense.mask.astype(jnp.float32)
    adj = dense.adj + eye * m[:, :, None]
    dinv = jax.lax.rsqrt(jnp.clip(adj.sum(-1), 1e-12, None))
    adj = (dinv[..., :, None] * adj * dinv[..., None, :]).astype(jnp.bfloat16)
    dense = DenseGraphBatch(x=dense.x, adj=adj, mask=dense.mask)
    y = jnp.asarray(labels)

    model = DenseTopkClassifier(num_classes=3, hidden=B.HIDDEN, ratio=0.5,
                                pre_normalized=True,
                                compute_dtype=jnp.bfloat16)
    params = model.init(jax.random.key(0), dense)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    # data enters as jit ARGUMENTS (bench.py:199-203 — the remote-compile
    # endpoint rejects requests with large embedded literals)
    def run(p, o, dense, y):
        def one(carry, _):
            p, o = carry

            def loss_fn(p):
                logits, _ = model.apply(p, dense)
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits, y).mean()

            loss, grads = jax.value_and_grad(loss_fn)(p)
            up, o = tx.update(grads, o)
            return (optax.apply_updates(p, up), o), loss

        (p, o), losses = jax.lax.scan(one, (p, o), None, length=steps)
        return losses[-1]

    n_edges = int(np.asarray(batch.edge_mask).sum())
    return jax.jit(run), (params, opt_state, dense, y), n_edges


def build_large_step(steps):
    """bench.py's ``bench_jax_large`` program: one sorted N=64k / E=1M
    graph, GCN → topk → GCN → readout → adam through the sparse pipeline."""
    import jax
    import jax.numpy as jnp
    import optax

    from tgp_tpu.graph import from_graphs
    from tgp_tpu.models.classifiers import PoolingClassifier
    from tgp_tpu.poolers import get_pooler

    rng = np.random.default_rng(7)
    s = rng.integers(0, B.N_LARGE, B.E_LARGE)
    r = rng.integers(0, B.N_LARGE, B.E_LARGE)
    x = rng.normal(size=(B.N_LARGE, B.F)).astype(np.float32)
    batch = from_graphs([(x, np.stack([s, r]))], sort_edges=True)
    y = jnp.asarray([1])

    pooler = get_pooler("topk", in_channels=B.HIDDEN, ratio=0.5)
    model = PoolingClassifier(pooler=pooler, num_classes=3, hidden=B.HIDDEN,
                              compute_dtype=jnp.bfloat16)
    params = model.init(jax.random.key(0), batch)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    def run(p, o, batch, y):
        def one(carry, _):
            p, o = carry

            def loss_fn(p):
                logits, _ = model.apply(p, batch)
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits, y).mean()

            loss, grads = jax.value_and_grad(loss_fn)(p)
            up, o = tx.update(grads, o)
            return (optax.apply_updates(p, up), o), loss

        (p, o), losses = jax.lax.scan(one, (p, o), None, length=steps)
        return losses[-1]

    n_edges = int(np.asarray(batch.edge_mask).sum())
    return jax.jit(run), (params, opt_state, batch, y), n_edges


def load_device_events(trace_dir):
    (path,) = glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz")
    data = json.load(gzip.open(path))
    evs = data["traceEvents"]
    dev_pids = {e["pid"] for e in evs
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in e["args"]["name"]}
    ops, modules = [], []
    for e in evs:
        if e.get("ph") != "X" or e["pid"] not in dev_pids:
            continue
        cat = e.get("args", {}).get("hlo_category")
        if cat is not None:
            # while/conditional events are ENVELOPES around their bodies'
            # ops — counting them would double every inner op
            if cat in ("while", "conditional"):
                pass  # envelopes around their bodies — would double-count
            else:
                ops.append(e)
        elif e["name"].startswith("jit_"):
            modules.append(e)
    return ops, modules


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--top", type=int, default=18)
    ap.add_argument("--large", action="store_true")
    args = ap.parse_args()

    import jax

    B._setup_compile_cache()
    if args.large:
        s_default = 10
        run, state, n_edges = build_large_step(args.steps or s_default)
    else:
        s_default = 50
        run, state, n_edges = build_step(args.steps or s_default)
    args.steps = args.steps or s_default
    float(run(*state))  # compile + warm

    trace_dir = tempfile.mkdtemp(prefix="tgp_step_trace_")
    with jax.profiler.trace(trace_dir):
        float(run(*state))

    ops, modules = load_device_events(trace_dir)
    if not ops:
        print("no device op events captured", file=sys.stderr)
        sys.exit(1)

    agg = collections.defaultdict(lambda: [0.0, 0, 0.0, 0.0, ""])
    for e in ops:
        a = e["args"]
        row = agg[e["name"]]
        row[0] += e["dur"]                              # us
        row[1] += 1
        row[2] += float(a.get("bytes_accessed", 0))
        row[3] += float(a.get("model_flops", 0))
        if not row[4]:
            row[4] = (a.get("tf_op", "") or "").split(":")[0]

    total_us = sum(v[0] for v in agg.values())
    mod_us = sum(e["dur"] for e in modules)
    s = args.steps
    leg = "large_graph sparse" if args.large else "flagship dense"
    print(f"{leg} step trace  (steps={s}, backend="
          f"{jax.default_backend()})")
    print(f"device op time:   {total_us/s:8.2f} us/step "
          f"({n_edges * s / total_us * 1e6 / 1e6:.1f} M edges/s)")
    if modules:
        print(f"module envelope:  {mod_us/s:8.2f} us/step "
              f"(gap = inter-op bubbles: {(mod_us-total_us)/s:.2f} us)")
    hdr = (f"{'op (fusion)':44s} {'us/step':>8s} {'%':>5s} {'calls':>5s} "
           f"{'GB/s':>6s} {'TF/s':>6s}  origin")
    print(hdr)
    print("-" * len(hdr))
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
    shown = 0.0
    for name, (us, cnt, byt, fl, op) in rows[: args.top]:
        shown += us
        gbs = byt / us / 1e3 if us else 0.0
        tfs = fl / us / 1e6 if us else 0.0
        print(f"{name[:44]:44s} {us/s:8.2f} {100*us/total_us:5.1f} "
              f"{cnt//s:5d} {gbs:6.0f} {tfs:6.2f}  {op[:40]}")
    rest = total_us - shown
    if rest > 0:
        n_rest = len(rows) - args.top
        print(f"{'(other ' + str(n_rest) + ' ops)':44s} {rest/s:8.2f} "
              f"{100*rest/total_us:5.1f}")
    by_cat = collections.defaultdict(float)
    for e in ops:
        by_cat[e["args"]["hlo_category"]] += e["dur"]
    print("\nby hlo_category (us/step):")
    for cat, us in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:32s} {us/s:8.2f} {100*us/total_us:5.1f}%")
    print(f"\ntrace dir: {trace_dir}")


if __name__ == "__main__":
    main()
