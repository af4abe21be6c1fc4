"""Accuracy-parity report for the BASELINE.md named datasets (VERDICT r2 #9).

The environment is zero-egress, so PROTEINS/NCI1 cannot be downloaded; the
TU-format parser (tgp_tpu/datasets/tudataset.py, fixture-tested) is ready.
The moment a TU dataset directory is mounted, ONE command produces the
parity table BASELINE.md promises:

    python scripts/parity_report.py --data-dir /path/to/TU  \
        [--datasets PROTEINS NCI1] [--epochs 50] [--seeds 3]

Runs BASELINE configs 1-2 (GCN+topk on PROTEINS; dense mincut + diff on
NCI1) across seeds and prints mean ± std test accuracy per (dataset,
pooler) plus the reference's published ballpark for context.  Exits 1 if a
requested dataset directory is missing.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# reference-reported ballparks (10-fold CV literature numbers for these
# poolers on these datasets; the reference repo publishes no numbers —
# BASELINE.md) — context only, not an assert threshold
CONTEXT = {
    ("PROTEINS", "topk"): "~0.70-0.76",
    ("PROTEINS", "mincut"): "~0.74-0.78",
    ("NCI1", "mincut"): "~0.74-0.80",
    ("NCI1", "diff"): "~0.76-0.80",
}

CONFIGS = {
    "PROTEINS": ["topk", "mincut"],
    "NCI1": ["mincut", "diff"],
}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--datasets", nargs="*", default=list(CONFIGS))
    ap.add_argument("--epochs", type=int, default=50)
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--cpu", action="store_true",
                    help="pin the cpu backend (default: whatever is live)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    root = Path(args.data_dir)
    missing = [d for d in args.datasets
               if not (root / d).is_dir() and not root.name == d]
    if missing:
        print(f"ERROR: dataset dirs not found under {root}: {missing}\n"
              "Mount the TU directories (e.g. PROTEINS/PROTEINS_A.txt ...) "
              "and re-run.")
        return 1

    from examples.classification import main as run_config

    rows = []
    for ds in args.datasets:
        for alias in CONFIGS.get(ds, ["topk"]):
            accs = []
            for seed in range(args.seeds):
                acc = run_config(alias=alias, epochs=args.epochs,
                                 dataset=ds, data_dir=str(root), seed=seed,
                                 verbose=False)
                accs.append(float(acc))
            import numpy as np

            rows.append((ds, alias, float(np.mean(accs)),
                         float(np.std(accs)), len(accs)))

    print(f"\n{'dataset':10s} {'pooler':8s} {'acc':>8s} {'±':>6s} "
          f"{'runs':>4s}  reference ballpark")
    for ds, alias, m, s, n in rows:
        ctx = CONTEXT.get((ds, alias), "-")
        print(f"{ds:10s} {alias:8s} {m:8.3f} {s:6.3f} {n:4d}  {ctx}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
