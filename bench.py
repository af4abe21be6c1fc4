"""Benchmark: edges/s/chip for the MP + pool hot path (forward+backward).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md) and its stack
(torch_geometric/torch_scatter) is not installed in this image, so the
baseline is a faithful torch-CPU re-implementation of the same training step
(GCN -> topk pool -> GCN -> readout, scatter/index_add based like
torch_scatter) on identical graphs.  ``vs_baseline`` = our edges/s on the
available accelerator / torch edges/s on CPU.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def _setup_compile_cache():
    """Persistent XLA compilation cache (repo-local, gitignored).

    The sparse-pipeline leg's remote compile through the axon tunnel can
    take minutes; with the cache warm (populated by any prior bench/test
    run on this machine) it is seconds, so the timeout-guarded subprocess
    lands its number inside the driver's window (VERDICT r3 weak #2)."""
    import jax

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".cache", "jax")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

# --- workload ------------------------------------------------------------
B = 64           # graphs per batch
N_PER = 256      # nodes per graph
P_EDGE = 0.03    # ER density
F = 128          # feature width
HIDDEN = 128
STEPS = 100      # long enough that device time per call dwarfs tunnel RTT
# large-graph leg (module-level so tests can shrink them)
N_LARGE, E_LARGE = 65536, 1_000_000
STEPS_LARGE = 20

#: nominal single-chip ceilings used for the utilization fields (TPU v5e:
#: 197 TF/s bf16 MXU, 819 GB/s HBM).  Measured practical envelopes are in
#: RESULTS.md (47 TF/s for this step's bmm chain shape, 273 GB/s for random
#: 256 B rows) — the nominal peaks keep the ratio comparable round-to-round.
PEAK_TF_S = 197.0
PEAK_HBM_GB_S = 819.0

_LAST_COST = None  # set by _timed_scan from the compiled program


def make_graphs(seed=0):
    rng = np.random.default_rng(seed)
    graphs = []
    for _ in range(B):
        n = N_PER
        upper = np.triu(rng.random((n, n)) < P_EDGE, k=1)
        adj = upper | upper.T
        s, r = np.nonzero(adj)
        x = rng.normal(size=(n, F)).astype(np.float32)
        graphs.append((x, np.stack([s, r]).astype(np.int64)))
    labels = rng.integers(0, 3, size=B).astype(np.int32)
    return graphs, labels


def bench_jax(graphs, labels):
    """Dense fast path: at this scale (256-node graphs) the scatter-free
    dense pipeline (batched-matmul MP + top_k + adjacency gathers) is the
    TPU-native choice — one XLA scatter SpMM alone costs ~1.3 ms while the
    per-graph dense bmm is ~free (scripts/exp_spmm_scales.py).  The sparse
    pipeline (GraphBatch + scatter / Pallas sorted-CSR) remains the path for
    large graphs; ``bench_jax_sparse`` measures it for the record."""
    import jax
    import jax.numpy as jnp
    import optax

    from tgp_tpu.graph import DenseGraphBatch, from_graphs, to_dense
    from tgp_tpu.models.fast_dense import DenseTopkClassifier

    batch = from_graphs(graphs)
    dense = to_dense(batch)
    # static preprocessing, once per batch outside the step: GCN-normalize
    # the adjacency and keep it in bf16 (halves the dominant [B,N,N] HBM
    # traffic; values are exact-ish degrees, features stay f32)
    eye = jnp.eye(dense.adj.shape[-1])
    m = dense.mask.astype(jnp.float32)
    adj = dense.adj + eye * m[:, :, None]
    dinv = jax.lax.rsqrt(jnp.clip(adj.sum(-1), 1e-12, None))
    adj = (dinv[..., :, None] * adj * dinv[..., None, :]).astype(jnp.bfloat16)
    dense = DenseGraphBatch(x=dense.x, adj=adj, mask=dense.mask)
    y = jnp.asarray(labels)

    # bf16 compute: within noise in round 4 (the step was scatter-bound);
    # after the top-k-VJP fix the matmuls dominate and bf16 buys ~9%
    # (114.5 → 105.1 µs measured round 5)
    model = DenseTopkClassifier(num_classes=3, hidden=HIDDEN, ratio=0.5,
                                pre_normalized=True,
                                compute_dtype=jnp.bfloat16)
    params = model.init(jax.random.key(0), dense)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    def make_step(dense, y):
        def one_step(carry, _):
            p, o = carry

            def loss_fn(p):
                logits, _ = model.apply(p, dense)
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits, y).mean()

            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, o = tx.update(grads, o)
            return (optax.apply_updates(p, updates), o), loss
        return one_step

    dt = _timed_scan(make_step, (params, opt_state), dense, y, rounds=2)
    n_edges = int(np.asarray(batch.edge_mask).sum())
    return n_edges / dt, dt


def bench_jax_large():
    """Large-graph end-to-end leg (VERDICT r4 #3): ONE sorted graph at
    N=64k, E=1M, F=128 with bf16 compute — the sparse pipeline's home
    regime, where the regime map engages the Pallas sorted-CSR kernel
    (E ≥ 262k).  Full train step: GCN → topk pool → GCN → readout → adam.

    Round-5 redesign (per-op itemization in RESULTS.md round 5 /
    scripts/exp_r5_step_trace.py --large): static collator CSR metadata
    (GraphBatch.row_ptr + transpose layout), scatter-free spmm_csr
    backward, and TopkPooling's masked pool_mode (no compact relabel —
    the pooled graph keeps the input's sorted layout), plus in-kernel edge
    weights (_grouped_kernel_w), took the step from 117 ms (8.5 M
    edges/s, scatter/gather-bound) to ~16 ms (~62 M edges/s): 4 SpMM-grade
    passes of gather (1.9 ms each, ~278 GB/s ≈ the random-row envelope) +
    weight-fused Pallas kernel (~0.8 ms each) + a masked-degree pass +
    top-k ranking glue.
    """
    import jax
    import jax.numpy as jnp
    import optax

    from tgp_tpu.graph import from_graphs
    from tgp_tpu.models.classifiers import PoolingClassifier
    from tgp_tpu.poolers import get_pooler

    N_LG, E_LG = N_LARGE, E_LARGE
    rng = np.random.default_rng(7)
    s = rng.integers(0, N_LG, E_LG)
    r = rng.integers(0, N_LG, E_LG)
    x = rng.normal(size=(N_LG, F)).astype(np.float32)
    batch = from_graphs([(x, np.stack([s, r]))], sort_edges=True)
    y = jnp.asarray([1])

    pooler = get_pooler("topk", in_channels=HIDDEN, ratio=0.5)
    model = PoolingClassifier(pooler=pooler, num_classes=3, hidden=HIDDEN,
                              compute_dtype=jnp.bfloat16)
    params = model.init(jax.random.key(0), batch)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    def make_step(batch, y):
        def one_step(carry, _):
            p, o = carry

            def loss_fn(p):
                logits, out = model.apply(p, batch)
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits, y).mean()

            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, o = tx.update(grads, o)
            return (optax.apply_updates(p, updates), o), loss
        return one_step

    dt = _timed_scan(make_step, (params, opt_state), batch, y,
                     steps=STEPS_LARGE)
    n_edges = int(np.asarray(batch.edge_mask).sum())
    return n_edges / dt, dt


def _timed_scan(make_one_step, carry, data, y, steps=None, rounds=1):
    """Device-honest per-step time from ONE compiled program (remote
    compiles through the axon tunnel can take minutes apiece, so the dual-
    length variant is too slow for the driver's window): the training loop
    runs inside a single jitted ``lax.scan``; we time 1 blocking call vs 4
    asynchronously queued calls and take the difference, which cancels the
    constant dispatch/transfer cost while the queued scans execute back-to-
    back on device.  (Round-1's python-loop timing pipelined async
    dispatches and could under-report device time — this explains the 623
    vs 715 M edges/s discrepancy between BENCH_r01 and RESULTS.md.)"""
    import functools

    import jax

    if steps is None:
        steps = STEPS

    # data enters as jit ARGUMENTS (not closure constants): the remote-
    # compile endpoint rejects requests with large embedded literals
    # (HTTP 413), and device buffers keep the request small either way
    def run(n, p, o, data, y):
        one_step = make_one_step(data, y)
        (p, o), losses = jax.lax.scan(one_step, (p, o), None, length=n)
        return p, o, losses[-1]

    run_s = jax.jit(functools.partial(run, steps))
    p, o = carry
    # per-step FLOPs / HBM bytes from the compiled program, for the
    # utilization fields (VERDICT r3 #7).  XLA's cost analysis counts a
    # lax.scan BODY ONCE regardless of length (verified on this backend:
    # scan(matmul, length=10) reports 2.149 GF ≈ 1 matmul), so the scan
    # program's totals ARE per-step numbers.  Best-effort: not every
    # backend implements cost_analysis.
    global _LAST_COST
    _LAST_COST = None
    try:
        ca = run_s.lower(p, o, data, y).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        _LAST_COST = {
            "flops_per_step": float(ca.get("flops", 0.0)),
            "hbm_bytes_per_step": float(ca.get("bytes accessed", 0.0)),
        }
    except Exception:
        pass
    # CRITICAL (round-2 finding, scripts/exp_bench_timing.py): on the axon
    # backend ``jax.block_until_ready`` is NOT an execution barrier — 100
    # train steps "complete" in <10 ms under it.  The only real sync is a
    # device→host transfer, so every timed region ends in ``float(loss)``.
    # This is also why round-1's numbers (623–715 M edges/s) were inflated.
    float(run_s(p, o, data, y)[-1])  # compile + warm

    def median(f, n=5):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            f()
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[n // 2]

    reps = 4

    def many():
        outs = [run_s(p, o, data, y)[-1] for _ in range(reps)]  # queued
        return float(outs[-1])

    # best-of-``rounds`` of the (median t1, median t4) difference:
    # transient load on the shared remote host inflates a single round by
    # ~10% (round-5: 1036 vs 1192 M edges/s across back-to-back runs); the
    # min of independent difference estimates resists one slow window.
    # rounds=2 only on the in-process headline legs — the timeout-guarded
    # subprocess legs keep one round so the driver window always closes.
    best = float("inf")
    for _ in range(rounds):
        t_one = median(lambda: float(run_s(p, o, data, y)[-1]))
        t_many = median(many)
        diff = t_many - t_one
        est = (t_many / (reps * steps) if diff <= 0  # jitter ate the signal
               else diff / ((reps - 1) * steps))
        best = min(best, est)
    return best


def bench_jax_default(graphs, labels):
    """The DOCUMENTED quick-start path (examples/classification.py): generic
    ``PoolingClassifier`` + ``get_pooler("topk")`` + ``prepare_batch`` —
    the model-level regime map densifies this workload automatically, so the
    default path should land within ~10% of the hand-picked
    ``DenseTopkClassifier`` above (VERDICT r3 #2b)."""
    import jax
    import jax.numpy as jnp
    import optax

    from tgp_tpu.graph import from_graphs
    from tgp_tpu.models.classifiers import PoolingClassifier
    from tgp_tpu.models.prepare import prepare_batch
    from tgp_tpu.poolers import get_pooler

    batch = from_graphs(graphs)
    n_edges = int(np.asarray(batch.edge_mask).sum())
    pooler = get_pooler("topk", in_channels=HIDDEN, ratio=0.5)
    # auto regime dispatch — pooler-aware (pooler=None never densifies)
    dense = prepare_batch(batch, pooler=pooler, normalize=True)
    y = jnp.asarray(labels)
    model = PoolingClassifier(pooler=pooler, num_classes=3, hidden=HIDDEN,
                              pre_normalized=True)
    params = model.init(jax.random.key(0), dense)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    def make_step(dense, y):
        def one_step(carry, _):
            p, o = carry

            def loss_fn(p):
                logits, out = model.apply(p, dense)
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits, y).mean() + out.loss_sum()

            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, o = tx.update(grads, o)
            return (optax.apply_updates(p, updates), o), loss
        return one_step

    dt = _timed_scan(make_step, (params, opt_state), dense, y)
    return n_edges / dt, dt


def bench_jax_sparse(graphs, labels):
    """The general sparse pipeline (for the record / large-graph regime)."""
    import jax
    import jax.numpy as jnp
    import optax

    from tgp_tpu.models.classifiers import PoolingClassifier
    from tgp_tpu.poolers import get_pooler

    from tgp_tpu.graph import from_graphs

    batch = from_graphs(graphs, sort_edges=True)
    y = jnp.asarray(labels)

    pooler = get_pooler("topk", in_channels=HIDDEN, ratio=0.5)
    model = PoolingClassifier(pooler=pooler, num_classes=3, hidden=HIDDEN)
    params = model.init(jax.random.key(0), batch)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    def make_step(batch, y):
        def one_step(carry, _):
            p, o = carry

            def loss_fn(p):
                logits, out = model.apply(p, batch)
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits, y).mean() + out.loss_sum()

            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, o = tx.update(grads, o)
            return (optax.apply_updates(p, updates), o), loss
        return one_step

    dt = _timed_scan(make_step, (params, opt_state), batch, y)
    n_edges = int(np.asarray(batch.edge_mask).sum())
    return n_edges / dt, dt


def bench_torch(graphs, labels):
    """Reference-equivalent torch CPU step (scatter-based GCN + per-graph
    topk pooling, like tgp's TopkPooling with torch_scatter kernels)."""
    import torch
    import torch.nn.functional as Fn

    xs = [torch.tensor(g[0]) for g in graphs]
    eis = [torch.tensor(g[1]) for g in graphs]
    # disjoint union
    offs, no = [], 0
    for x in xs:
        offs.append(no)
        no += x.shape[0]
    x = torch.cat(xs)
    ei = torch.cat([e + o for e, o in zip(eis, offs)], dim=1)
    bvec = torch.cat([torch.full((g[0].shape[0],), i, dtype=torch.long)
                      for i, g in enumerate(graphs)])
    y = torch.tensor(np.asarray(labels), dtype=torch.long)
    N = x.shape[0]

    class Net(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.l1 = torch.nn.Linear(F, HIDDEN)
            self.p = torch.nn.Parameter(torch.randn(HIDDEN))
            self.l2 = torch.nn.Linear(HIDDEN, HIDDEN)
            self.head = torch.nn.Linear(HIDDEN, 3)

        @staticmethod
        def gcn(h, ei, n):
            deg = torch.zeros(n).index_add_(
                0, ei[1], torch.ones(ei.shape[1])) + 1
            dinv = deg.rsqrt()
            w = dinv[ei[0]] * dinv[ei[1]]
            out = torch.zeros_like(h).index_add_(0, ei[1], h[ei[0]] * w[:, None])
            return out + h * (dinv * dinv)[:, None]

        def forward(self, x, ei, bvec):
            h = torch.relu(self.gcn(self.l1(x), ei, N))
            score = torch.tanh(h @ self.p / self.p.norm())
            # per-graph topk (ratio .5), vectorized like PyG's C++ topk:
            # all graphs have N_PER nodes, so one reshape + row-topk works
            k = int(np.ceil(0.5 * N_PER))
            sc = score.view(B, N_PER)
            top = sc.topk(k, dim=1).indices + torch.arange(
                B).view(B, 1) * N_PER
            keep = top.reshape(-1)
            remap = -torch.ones(N, dtype=torch.long)
            remap[keep] = torch.arange(keep.numel())
            h2 = h[keep] * score[keep, None]
            em = (remap[ei[0]] >= 0) & (remap[ei[1]] >= 0)
            ei2 = remap[:, None].squeeze(1)[ei[:, em]]
            h2 = torch.relu(self.gcn(self.l2(h2), ei2, keep.numel()))
            pooled = torch.zeros(B, HIDDEN).index_add_(0, bvec[keep], h2)
            return self.head(pooled)

    net = Net()
    opt = torch.optim.Adam(net.parameters(), lr=1e-3)

    def step():
        opt.zero_grad()
        logits = net(x, ei, bvec)
        loss = Fn.cross_entropy(logits, y)
        loss.backward()
        opt.step()
        return loss

    step()  # warmup
    # best-of-3 chunks: min per-step time resists transient host-CPU load
    # (a loaded machine otherwise inflates vs_baseline several-fold)
    n_steps = max(STEPS // 3, 5)
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_steps):
            step()
        dt = min(dt, (time.perf_counter() - t0) / n_steps)
    return ei.shape[1] / dt, dt


def _leg_subprocess(flag: str, timeout_s: int = 420):
    """Run a bench leg in a subprocess with a hard timeout so a slow remote
    compile can never eat the driver's bench window (the dense headline +
    vs_baseline always print)."""
    import subprocess
    import sys

    try:
        out = subprocess.run(
            [sys.executable, __file__, flag],
            capture_output=True, text=True, timeout=timeout_s)
        for line in out.stdout.strip().splitlines()[::-1]:
            try:
                return float(line)
            except ValueError:
                continue
    except Exception:
        pass
    return None


def main():
    import sys

    _setup_compile_cache()
    graphs, labels = make_graphs()
    if "--sparse-only" in sys.argv:
        sparse, _ = bench_jax_sparse(graphs, labels)
        print(round(sparse, 1))
        return
    if "--large-only" in sys.argv:
        large, _ = bench_jax_large()
        print(round(large, 1))
        return
    ours, dt_ours = bench_jax(graphs, labels)
    cost = _LAST_COST
    # the DOCUMENTED default path (PoolingClassifier + prepare_batch):
    # model-level regime dispatch should put it within ~10% of the
    # hand-picked dense model above
    try:
        default_path, _ = bench_jax_default(graphs, labels)
    except Exception as e:  # report, never silently null the leg
        print(f"default-path leg FAILED: {type(e).__name__}: {e}",
              file=sys.stderr)
        default_path = None
    # the general sparse pipeline (auto-dispatched kernels), same workload
    # — the regime map's other leg (VERDICT r2 #3); timeout-guarded
    sparse = _leg_subprocess("--sparse-only")
    # the sparse pipeline's HOME regime: one N=64k / E=1M sorted graph
    # with the Pallas kernel engaged (VERDICT r4 #3); timeout-guarded
    large = _leg_subprocess("--large-only", timeout_s=560)
    try:
        base, dt_base = bench_torch(graphs, labels)
    except Exception:
        base = None
    rec = {
        "metric": "edges_per_s_chip",
        "value": round(ours, 1),
        "unit": "edges/s",
        "vs_baseline": round(ours / base, 3) if base else None,
        "default_path": round(default_path, 1) if default_path else None,
        "sparse_pipeline": sparse,
        "large_graph": large,
    }
    if cost:
        tf_s = cost["flops_per_step"] / dt_ours / 1e12
        gb_s = cost["hbm_bytes_per_step"] / dt_ours / 1e9
        rec.update({
            "tf_s_effective": round(tf_s, 2),
            "mxu_util_pct": round(100 * tf_s / PEAK_TF_S, 2),
            # cost-analysis "bytes accessed" counts every buffer touch,
            # including VMEM-resident reuse, so this can EXCEED the HBM
            # peak — it is an upper bound on HBM traffic, reported as-is
            # (the honest lower-bound utilization is mem/.peak capped)
            "mem_gb_s_effective": round(gb_s, 1),
            "hbm_util_pct_upper": round(100 * gb_s / PEAK_HBM_GB_S, 2),
        })
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
