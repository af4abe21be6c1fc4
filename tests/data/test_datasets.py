"""Dataset loader tests against committed raw-format fixtures
(reference loaders: tgp/datasets/graph_classification_bench.py:88-105,
tgp/datasets/expwl1.py:50-63, tgp/datasets/pygsp.py:9-140, plus the TU
format PyG's TUDataset parses for PROTEINS/NCI1)."""

from pathlib import Path

import numpy as np
import pytest

from tgp_tpu.datasets import (
    PYGSP_GRAPHS,
    EXPWL1Dataset,
    GraphClassificationBench,
    PyGSPDataset,
    TUDataset,
    pygsp_graph,
)

FIXTURES = Path(__file__).resolve().parent.parent / "fixtures"


# ---------------------------------------------------------------- TU format
def test_tu_parse_mini():
    ds = TUDataset(root=FIXTURES / "tu", name="MINI")
    graphs, labels = ds.load()
    assert len(graphs) == 12 and len(labels) == 12
    assert ds.num_classes == 2
    assert set(np.unique(labels)) <= {0, 1}
    # features = 2 attributes then one-hot(3 node labels) — PyG
    # read_tu_data column order (attributes first)
    assert ds.num_features == 5
    x0 = ds.load()[0][0][0]
    onehot_block = x0[:, 2:]
    np.testing.assert_allclose(onehot_block.sum(1), 1.0)
    assert set(np.unique(onehot_block)) <= {0.0, 1.0}
    for x, ei in graphs:
        n = x.shape[0]
        assert ei.shape[0] == 2
        assert ei.min() >= 0 and ei.max() < n
        # undirected: every edge has its reverse
        fwd = set(map(tuple, ei.T.tolist()))
        assert all((j, i) in fwd for i, j in fwd)
    # edge attributes align with per-graph edge counts
    ea = ds.edge_attributes()
    assert all(a.shape[0] == g[1].shape[1] for a, g in zip(ea, graphs))


def test_tu_missing_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        TUDataset(root=tmp_path, name="NOPE").load()


def test_tu_feeds_graph_batch():
    from tgp_tpu.graph import from_graphs

    graphs, labels = TUDataset(root=FIXTURES / "tu", name="MINI").load()
    batch = from_graphs(graphs[:4])
    assert int(batch.node_mask.sum()) == sum(g[0].shape[0] for g in graphs[:4])


# ------------------------------------------------- GraphClassificationBench
def test_gcb_raw_format_splits():
    counts = {}
    for split in ("train", "val", "test"):
        ds = GraphClassificationBench(root=FIXTURES / "gcb", split=split)
        graphs, labels = ds.load()
        counts[split] = len(graphs)
        assert len(labels) == len(graphs)
        assert set(np.unique(labels)) <= {0, 1}
        for x, ei in graphs:
            assert x.shape[1] == 3
            assert ei.max() < x.shape[0]
    assert counts == {"train": 8, "val": 4, "test": 4}


def test_gcb_missing_raises(tmp_path):
    with pytest.raises(RuntimeError, match="download"):
        GraphClassificationBench(root=tmp_path).load()


def test_gcb_file_name_flags():
    assert GraphClassificationBench(easy=False, small=False).file_name == "hard"
    assert GraphClassificationBench(easy=True, small=True).file_name == \
        "easy_small"


# ------------------------------------------------------------------ EXPWL1
def test_expwl1_fixture():
    graphs, labels = EXPWL1Dataset(root=FIXTURES / "expwl1").load()
    assert len(graphs) == 10
    assert labels.dtype == np.int32


def test_expwl1_missing_raises(tmp_path):
    with pytest.raises(RuntimeError, match="zero-egress"):
        EXPWL1Dataset(root=tmp_path).load()


# ------------------------------------------------------------------- PyGSP
@pytest.mark.parametrize("name", PYGSP_GRAPHS)
def test_pygsp_graphs_build(name):
    x, ei, w, y = pygsp_graph(name, n=36, seed=1)
    n = x.shape[0]
    assert ei.shape[0] == 2 and ei.shape[1] == w.shape[0]
    assert y.shape == (n,)
    assert ei.min() >= 0 and ei.max() < n
    assert (w > 0).all()
    # symmetric edge list
    fwd = {(int(i), int(j)) for i, j in ei.T}
    assert all((j, i) in fwd for i, j in fwd), name


def test_pygsp_community_labels():
    _, _, _, y = pygsp_graph("StochasticBlockModel", n=60, seed=0)
    assert len(np.unique(y)) > 1


def test_pygsp_unavailable_raises():
    with pytest.raises(ValueError, match="pygsp"):
        pygsp_graph("Minnesota")
    with pytest.raises(ValueError, match="not available"):
        pygsp_graph("Bogus")


def test_pygsp_dataset_to_batch_and_pool():
    """A PyGSP graph flows through a pooler end-to-end."""
    from tgp_tpu.poolers import get_pooler

    batch = PyGSPDataset(name="Sensor", n=32, seed=0).as_graph_batch()
    pooler = get_pooler("graclus")
    out = pooler(batch)
    assert out.x.shape[0] > 0


def test_graph_loader_short_dataset_cycles_to_static_batch():
    """Datasets smaller than a batch: batches are padded by cycling the
    graph order, stay at exactly batch_size graphs, and fit the computed
    budgets (regression: repeat-padding under-filled the batch and
    overflowed the node budget)."""
    import jax.numpy as jnp

    from tgp_tpu.data.loaders import GraphLoader, compute_budgets
    from tests.utils_graphs import erdos_renyi_graph

    graphs = [erdos_renyi_graph(5 + i, p=0.5, num_features=3, seed=i)
              for i in range(4)]
    B = 11
    loader = GraphLoader(graphs, np.arange(4), batch_size=B)
    pn, pe, mx = compute_budgets(graphs, B)
    assert loader.pad_nodes == pn
    batches = list(loader._iter_with_indices())
    assert len(batches) == 1
    batch, y, idx = batches[0]
    assert len(idx) == B                       # static batch size
    assert batch.num_graphs == B
    assert int(np.asarray(batch.node_mask).sum()) <= pn
    # every original graph appears at least once
    assert set(np.asarray(idx)) == {0, 1, 2, 3}


# ---- Gset / Multipartite / CSBM (reference: tgp/datasets/gset.py:11-183,
# multipartite_graph.py:7-60, csbm.py:227-385) ------------------------------


def test_parse_gset(tmp_path):
    f = tmp_path / "G99"
    f.write_text("3 2\n1 2 1\n2 3 -1\n")
    from tgp_tpu.datasets.gset import parse_gset

    x, ei, ew = parse_gset(f)
    assert x.shape == (3, 1)
    assert ei.shape == (2, 4)  # undirected: both directions materialized
    # weights mirrored per direction
    assert sorted(ew.tolist()) == [-1.0, -1.0, 1.0, 1.0]
    # degree features normalized to max degree (node 1 touches both edges)
    assert x.max() == 1.0
    pairs = set(map(tuple, ei.T.tolist()))
    assert (0, 1) in pairs and (1, 0) in pairs and (1, 2) in pairs


def test_gset_dataset_missing_raises(tmp_path):
    from tgp_tpu.datasets.gset import GsetDataset

    with pytest.raises(RuntimeError, match="not found and download failed"):
        GsetDataset(name="G0", root=str(tmp_path / "nowhere")).load()


def test_multipartite_structure():
    from tgp_tpu.datasets.multipartite import MultipartiteGraphDataset

    ds = MultipartiteGraphDataset(parts=(3, 4, 5), feature_dim=6, seed=1)
    assert len(ds) == 1
    x, ei, labels = ds[0]
    n = 12
    assert x.shape == (n, 6) and labels.shape == (n,)
    # complete multipartite: exactly the cross-part ordered pairs
    expect = sum(p * (n - p) for p in (3, 4, 5))
    assert ei.shape == (2, expect)
    assert (labels[ei[0]] != labels[ei[1]]).all()


@pytest.mark.parametrize("gmm", [1, 3])
def test_csbm_shapes_and_connectivity(gmm):
    import scipy.sparse as sp
    import scipy.sparse.csgraph as csgraph

    from tgp_tpu.datasets.csbm import CSBMDataset

    ds = CSBMDataset(num_graphs=2, num_nodes=40, num_communities=3,
                     p_in=0.5, p_out=0.05, feature_dim=5,
                     gmm_components=gmm, seed=3)
    assert len(ds) == 2
    for x, ei, comm in ds:
        assert x.shape == (40, 5) and comm.shape == (40,)
        assert comm.min() >= 0 and comm.max() < 3
        # symmetric, self-loop-free, connected (require_connected default)
        adj = sp.csr_matrix((np.ones(ei.shape[1]), (ei[0], ei[1])),
                            shape=(40, 40))
        assert (adj != adj.T).nnz == 0
        assert adj.diagonal().sum() == 0
        assert csgraph.connected_components(
            adj, directed=False, return_labels=False) == 1


def test_csbm_community_signal_separates_features():
    """mu scales the community mean — with a large mu, nearest-centroid on
    the features should recover the communities (the dataset's whole
    point for clustering benchmarks)."""
    from tgp_tpu.datasets.csbm import CSBMDataset

    x, _, comm = CSBMDataset(num_nodes=120, num_communities=3, mu=8.0,
                             feature_dim=8, seed=0)[0]
    cents = np.stack([x[comm == c].mean(0) for c in range(3)])
    pred = np.argmin(
        ((x[:, None, :] - cents[None]) ** 2).sum(-1), axis=1)
    assert (pred == comm).mean() > 0.95


# ---- BucketedGraphLoader (TPU-native bucketed padding, SURVEY §7) ---------


def _skewed_graphs(seed=0):
    rng = np.random.default_rng(seed)
    graphs = []
    for n in [4] * 12 + [8] * 12 + [40] * 4:
        e = max(2 * n, 4)
        ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
        graphs.append((rng.normal(size=(n, 3)).astype(np.float32),
                       ei.astype(np.int64)))
    return graphs


def test_bucketed_loader_reduces_padding():
    from tgp_tpu.data.loaders import BucketedGraphLoader, GraphLoader

    graphs = _skewed_graphs()
    flat = GraphLoader(graphs, batch_size=4)
    buck = BucketedGraphLoader(graphs, batch_size=4, num_buckets=4)
    flat_nodes = sum(b.x.shape[0] for b in flat)
    buck_nodes = sum(b.x.shape[0] for b in buck)
    assert buck_nodes < 0.6 * flat_nodes  # big win on a skewed dataset
    # bounded executables: at most num_buckets distinct static shapes
    shapes = {(b.x.shape, b.senders.shape) for b in buck}
    assert len(shapes) <= 4


def test_bucketed_loader_covers_every_graph_once_per_epoch():
    from tgp_tpu.data.loaders import BucketedGraphLoader

    graphs = _skewed_graphs()
    y = np.arange(len(graphs))
    loader = BucketedGraphLoader(graphs, y, batch_size=4, num_buckets=3,
                                 shuffle=True, seed=7)
    seen = np.concatenate([yy for _, yy in loader])
    # full-size buckets: every graph exactly once (28 graphs, B=4 divides
    # each bucket after the quantile split merges equal budgets)
    assert len(loader) == len(list(iter(loader)))
    assert set(seen.tolist()) == set(range(len(graphs)))


def test_bucketed_loader_uniform_dataset_collapses_to_one_bucket():
    from tgp_tpu.data.loaders import BucketedGraphLoader

    rng = np.random.default_rng(0)
    graphs = []
    for _ in range(8):
        ei = np.stack([rng.integers(0, 6, 12), rng.integers(0, 6, 12)])
        graphs.append((rng.normal(size=(6, 3)).astype(np.float32),
                       ei.astype(np.int64)))
    loader = BucketedGraphLoader(graphs, batch_size=4, num_buckets=4)
    assert len(loader.budgets) == 1  # equal budgets merged


def test_bucketed_loader_short_bucket_cycles_to_static_batch():
    from tgp_tpu.data.loaders import BucketedGraphLoader

    graphs = _skewed_graphs()[:7]  # bucket sizes not divisible by B
    loader = BucketedGraphLoader(graphs, np.arange(7), batch_size=4,
                                 num_buckets=2)
    for batch, y in loader:
        assert len(y) == 4  # B stays static via in-bucket cycling
        assert batch.num_graphs == 4


def test_bucketed_loader_trains_jit():
    """End-to-end: the bucketed stream drives a jitted forward with one
    compile per bucket shape."""
    import jax

    from tgp_tpu.data.loaders import BucketedGraphLoader
    from tgp_tpu.models.classifiers import PoolingClassifier
    from tgp_tpu.poolers import get_pooler

    graphs = _skewed_graphs()
    y = np.array([i % 3 for i in range(len(graphs))])
    loader = BucketedGraphLoader(graphs, y, batch_size=4, num_buckets=3)
    pooler = get_pooler("topk", in_channels=8, ratio=0.5)
    model = PoolingClassifier(pooler=pooler, num_classes=3, hidden=8)
    first = next(iter(loader))[0]
    params = model.init(jax.random.key(0), first)

    @jax.jit
    def fwd(p, b):
        return model.apply(p, b)[0]

    for batch, yy in loader:
        logits = fwd(params, batch)
        assert logits.shape == (4, 3)
        assert np.isfinite(np.asarray(logits)).all()


def test_graph_loader_explicit_budgets_and_no_labels():
    """Explicit pad_nodes/pad_edges/max_nodes override the computed budgets
    (the `or` branches); labels=None yields bare batches."""
    from tgp_tpu.data.loaders import GraphLoader

    rng = np.random.default_rng(0)
    graphs = []
    for i in range(5):
        n = 6 + i
        x = rng.normal(size=(n, 3)).astype(np.float32)
        ei = np.array([[j, (j + 1) % n] for j in range(n)]).T
        graphs.append((x, ei))
    ld = GraphLoader(graphs, batch_size=2, pad_nodes=64, pad_edges=128,
                     max_nodes=16)
    assert ld.pad_nodes == 64 and ld.pad_edges == 128 and ld.max_nodes == 16
    batches = list(ld)
    assert len(batches) == 3
    for b in batches:  # bare GraphBatch, no (batch, y) tuple
        assert b.num_nodes == 64


def test_graph_loader_shuffle_cycles_short_final_batch():
    """shuffle=True reorders; the short final batch cycles to keep B
    static (wrap branch)."""
    from tgp_tpu.data.loaders import GraphLoader

    rng = np.random.default_rng(1)
    graphs = []
    for i in range(5):
        x = rng.normal(size=(4, 2)).astype(np.float32)
        ei = np.array([[0, 1], [1, 0]])
        graphs.append((x, ei))
    y = np.arange(5)
    ld = GraphLoader(graphs, labels=y, batch_size=3, shuffle=True, seed=3)
    seen = []
    for batch, yy in ld:
        assert len(yy) == 3
        seen.extend(yy.tolist())
    assert set(seen) == set(range(5))  # every graph appears
    assert len(seen) == 6              # final batch cycled one repeat


def test_bucketed_loader_more_buckets_than_graphs():
    """num_buckets > len(graphs) clamps; empty quantile parts are skipped."""
    from tgp_tpu.data.loaders import BucketedGraphLoader

    rng = np.random.default_rng(2)
    graphs = []
    for n in (4, 20):
        x = rng.normal(size=(n, 2)).astype(np.float32)
        ei = np.array([[j, (j + 1) % n] for j in range(n)]).T
        graphs.append((x, ei))
    ld = BucketedGraphLoader(graphs, labels=np.array([0, 1]), batch_size=1,
                             num_buckets=8)
    assert 1 <= len(ld.buckets) <= 2
    total = sum(len(b) for b in ld.buckets)
    assert total == 2
    for batch, y in ld:
        assert batch.num_graphs == 1


def test_tu_parser_edge_labels_onehot():
    """MINI2 fixture: edge labels (no edge attributes, no node attributes)
    — one-hot encoded per the reference's PyG TUDataset semantics."""
    from tgp_tpu.datasets.tudataset import parse_tu_dir

    graphs, y, edge_attrs = parse_tu_dir("tests/fixtures/tu", "MINI2")
    assert len(graphs) == 6 and len(edge_attrs) == 6
    for (x, ei), ea in zip(graphs, edge_attrs):
        assert ea is not None and ea.shape == (ei.shape[1], 3)
        # one-hot rows
        np.testing.assert_allclose(ea.sum(1), 1.0)
        assert set(np.unique(ea)) <= {0.0, 1.0}
        # node features are the one-hot node labels (2 classes)
        assert x.shape[1] == 2
    assert set(y.tolist()) == {0, 1}


def test_tu_parser_edge_labels_concat_with_attributes(tmp_path):
    """Both edge_labels AND edge_attributes present → concatenated."""
    import shutil

    from tgp_tpu.datasets.tudataset import parse_tu_dir

    src = Path("tests/fixtures/tu/MINI2")
    dst = tmp_path / "MINI2"
    shutil.copytree(src, dst)
    n_edges = len((src / "MINI2_A.txt").read_text().strip().splitlines())
    attrs = "\n".join(f"{i * 0.5}, {i * 0.25}" for i in range(n_edges))
    (dst / "MINI2_edge_attributes.txt").write_text(attrs + "\n")
    graphs, y, edge_attrs = parse_tu_dir(str(tmp_path), "MINI2")
    for (x, ei), ea in zip(graphs, edge_attrs):
        assert ea.shape == (ei.shape[1], 2 + 3)  # attrs(2) then one-hot(3)
        # PyG read_tu_data order: attribute columns first, labels after
        lab_block = ea[:, 2:]
        np.testing.assert_allclose(lab_block.sum(1), 1.0)
        assert set(np.unique(lab_block)) <= {0.0, 1.0}
