"""Generate tiny committed dataset fixtures in the ORIGINAL raw formats, so
the download-backed loaders are exercised by tests and runnable examples
exist without network access.

- tests/fixtures/tu/MINI/      TU text format (chrsmrrs.github.io/datasets)
- tests/fixtures/gcb/easy_small.npz   GraphClassificationBench raw keys
  ({tr,val,te}_{feat,adj,class}) per reference
  graph_classification_bench.py:88-105
- tests/fixtures/expwl1/expwl1.npz    EXPWL1 npz conversion (x/edge_index/y)

Run once:  python scripts/make_dataset_fixtures.py
"""

from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent / "tests" / "fixtures"


def make_graph(rng, n, p=0.3):
    upper = np.triu(rng.random((n, n)) < p, 1)
    adj = (upper | upper.T).astype(np.float32)
    # ensure no isolated nodes (connect each to a random other)
    for i in range(n):
        if adj[i].sum() == 0:
            j = (i + 1) % n
            adj[i, j] = adj[j, i] = 1.0
    return adj


def write_tu():
    rng = np.random.default_rng(7)
    d = ROOT / "tu" / "MINI"
    d.mkdir(parents=True, exist_ok=True)
    n_graphs = 12
    a_rows, gi_rows, gl_rows, nl_rows, na_rows, ea_rows = [], [], [], [], [], []
    offset = 0
    for g in range(n_graphs):
        n = int(rng.integers(4, 9))
        adj = make_graph(rng, n)
        s, r = np.nonzero(adj)
        for i, j in zip(s, r):
            a_rows.append(f"{i + 1 + offset}, {j + 1 + offset}")
            ea_rows.append(f"{rng.random():.4f}")
        for i in range(n):
            gi_rows.append(str(g + 1))
            nl_rows.append(str(int(rng.integers(0, 3))))
            na_rows.append(", ".join(f"{v:.4f}" for v in rng.normal(size=2)))
        gl_rows.append(str(1 if g % 2 else -1))  # {-1,1} labels like PROTEINS
        offset += n
    (d / "MINI_A.txt").write_text("\n".join(a_rows) + "\n")
    (d / "MINI_graph_indicator.txt").write_text("\n".join(gi_rows) + "\n")
    (d / "MINI_graph_labels.txt").write_text("\n".join(gl_rows) + "\n")
    (d / "MINI_node_labels.txt").write_text("\n".join(nl_rows) + "\n")
    (d / "MINI_node_attributes.txt").write_text("\n".join(na_rows) + "\n")
    (d / "MINI_edge_attributes.txt").write_text("\n".join(ea_rows) + "\n")
    print(f"wrote {d} ({n_graphs} graphs, {offset} nodes)")


def obj_array(items):
    arr = np.empty(len(items), dtype=object)
    for i, it in enumerate(items):
        arr[i] = it
    return arr


def write_gcb():
    rng = np.random.default_rng(11)
    d = ROOT / "gcb"
    d.mkdir(parents=True, exist_ok=True)
    out = {}
    for key, count in (("tr", 8), ("val", 4), ("te", 4)):
        feats, adjs, classes = [], [], []
        for _ in range(count):
            n = int(rng.integers(5, 9))
            adjs.append(make_graph(rng, n))
            feats.append(rng.normal(size=(n, 3)).astype(np.float32))
            onehot = np.zeros(2, np.float32)
            onehot[int(rng.integers(0, 2))] = 1.0
            classes.append(onehot)
        out[f"{key}_feat"] = obj_array(feats)
        out[f"{key}_adj"] = obj_array(adjs)
        out[f"{key}_class"] = np.array(classes)
    np.savez(d / "easy_small.npz", **out)
    print(f"wrote {d / 'easy_small.npz'}")


def write_expwl1():
    rng = np.random.default_rng(13)
    d = ROOT / "expwl1"
    d.mkdir(parents=True, exist_ok=True)
    xs, eis, ys = [], [], []
    for g in range(10):
        n = int(rng.integers(5, 9))
        adj = make_graph(rng, n)
        s, r = np.nonzero(adj)
        xs.append(np.ones((n, 1), np.float32))
        eis.append(np.stack([s, r]).astype(np.int64))
        ys.append(g % 2)
    np.savez(d / "expwl1.npz",
             x=obj_array(xs),
             edge_index=obj_array(eis),
             y=np.asarray(ys))
    print(f"wrote {d / 'expwl1.npz'}")


if __name__ == "__main__":
    write_tu()
    write_gcb()
    write_expwl1()
