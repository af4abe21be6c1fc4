"""Generate committed TU-format *statistical twins* of PROTEINS and NCI1.

The image is zero-egress, so the real TU datasets (BASELINE.md configs 1-2;
reference usage /root/reference/examples/classification.py:157-169) cannot
be downloaded.  These twins are seeded synthetic datasets written in the
EXACT raw TU text format (chrsmrrs.github.io/datasets) with the real sets'
headline statistics, sized to train meaningfully, so the full
parser → loader → model → accuracy pipeline runs end-to-end unattended and
its accuracy can be frozen as a regression gate (VERDICT r3 missing #1 /
next #3).  The moment real data is mounted, the same one-command path
(scripts/parity_report.py) runs on it instead.

PROTEINS_SYN — 600 graphs, 2 classes, ~39 nodes avg, 3 node labels.
  Class signal: node-label mixture AND average degree differ by class, with
  per-graph noise so a GCN+pool classifier lands ~0.8-0.9, not 1.0
  (the real PROTEINS tops out ~0.76 — separability is deliberately
  imperfect here too).
NCI1_SYN — 800 graphs, 2 classes, ~30 nodes avg, 37 node labels.
  Class signal: a labeled 4-node motif (ring of specific labels) is planted
  with class-conditional probability 0.9 / 0.1 on a sparse molecule-like
  backbone — motif detection, the thing GNNs actually do on NCI1.

Files are gzip-compressed (``<NAME>_A.txt.gz`` …); the parser
(tgp_tpu/datasets/tudataset.py) reads ``.txt`` and ``.txt.gz``
transparently.  Deterministic: re-running reproduces byte-identical
fixtures.
"""

from __future__ import annotations

import gzip
import sys
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
OUT = ROOT / "tests" / "fixtures" / "tu"


def _connected_er(rng, n, avg_deg):
    """Undirected edge set: a random spanning tree (connectivity) + ER
    extras up to the target average degree."""
    edges = set()
    perm = rng.permutation(n)
    for i in range(1, n):
        a, b = perm[rng.integers(0, i)], perm[i]
        edges.add((min(a, b), max(a, b)))
    target = max(n - 1, int(round(avg_deg * n / 2)))
    tries = 0
    while len(edges) < target and tries < 20 * target:
        a, b = rng.integers(0, n, 2)
        tries += 1
        if a != b:
            edges.add((min(a, b), max(a, b)))
    return sorted(edges)


def make_proteins_syn(seed=7, n_graphs=600):
    rng = np.random.default_rng(seed)
    graphs = []
    for _ in range(n_graphs):
        y = int(rng.integers(0, 2))
        n = int(np.clip(rng.lognormal(3.55, 0.45), 10, 96))
        # class-dependent degree, overlapping supports
        avg_deg = rng.normal(3.45 if y == 0 else 4.15, 0.45)
        avg_deg = float(np.clip(avg_deg, 2.0, 6.0))
        edges = _connected_er(rng, n, avg_deg)
        # class-dependent node-label mixture (3 labels), noisy
        p = np.asarray([0.50, 0.30, 0.20] if y == 0 else [0.32, 0.30, 0.38])
        p = np.clip(p + rng.normal(0, 0.06, 3), 0.02, None)
        labels = rng.choice(3, size=n, p=p / p.sum())
        graphs.append((labels, edges, y))
    return graphs, 3


def make_nci1_syn(seed=11, n_graphs=800):
    rng = np.random.default_rng(seed)
    n_labels = 37
    motif_labels = [4, 11, 23, 30]  # the planted ring's node labels
    graphs = []
    for _ in range(n_graphs):
        y = int(rng.integers(0, 2))
        n = int(np.clip(rng.lognormal(3.35, 0.35), 8, 80))
        # molecule-like sparse backbone
        edges = _connected_er(rng, n, float(rng.normal(2.2, 0.2)))
        labels = rng.choice(n_labels, size=n,
                            p=_nci_label_prior(n_labels))
        plant = rng.random() < (0.9 if y == 1 else 0.1)
        if plant and n >= 6:
            sites = rng.choice(n, size=4, replace=False)
            for i, lab in zip(sites, motif_labels):
                labels[i] = lab
            ring = [(int(min(a, b)), int(max(a, b)))
                    for a, b in zip(sites, np.roll(sites, 1))]
            edges = sorted(set(edges) | set(ring))
        graphs.append((labels, edges, y))
    return graphs, n_labels


def _nci_label_prior(k):
    # Zipf-ish prior like real atom-type frequencies (C/N/O dominate)
    w = 1.0 / (np.arange(1, k + 1) ** 1.3)
    return w / w.sum()


def write_tu(name, graphs):
    """Write (labels, edges, y) per graph in raw TU text format, gzipped."""
    d = OUT / name
    d.mkdir(parents=True, exist_ok=True)

    a_lines, gi_lines, gl_lines, nl_lines = [], [], [], []
    off = 0
    for gid, (labels, edges, y) in enumerate(graphs, start=1):
        n = len(labels)
        for (u, v) in edges:  # TU lists both directions
            a_lines.append(f"{u + 1 + off}, {v + 1 + off}")
            a_lines.append(f"{v + 1 + off}, {u + 1 + off}")
        gi_lines.extend([str(gid)] * n)
        gl_lines.append(str(y))
        nl_lines.extend(str(int(l)) for l in labels)
        off += n

    for suffix, lines in (("A", a_lines), ("graph_indicator", gi_lines),
                          ("graph_labels", gl_lines),
                          ("node_labels", nl_lines)):
        path = d / f"{name}_{suffix}.txt.gz"
        # mtime=0 → byte-identical output across runs
        with gzip.GzipFile(path, "wb", mtime=0) as f:
            f.write(("\n".join(lines) + "\n").encode())
        print(f"  {path.relative_to(ROOT)}  "
              f"({path.stat().st_size / 1024:.0f} KB)")


def main():
    for name, maker in (("PROTEINS_SYN", make_proteins_syn),
                        ("NCI1_SYN", make_nci1_syn)):
        graphs, _ = maker()
        ns = np.asarray([len(g[0]) for g in graphs])
        es = np.asarray([len(g[1]) for g in graphs])
        ys = np.asarray([g[2] for g in graphs])
        print(f"{name}: {len(graphs)} graphs, nodes {ns.mean():.1f} "
              f"(max {ns.max()}), undirected edges {es.mean():.1f}, "
              f"class balance {ys.mean():.2f}")
        write_tu(name, graphs)


if __name__ == "__main__":
    sys.exit(main())
