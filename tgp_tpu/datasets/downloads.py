"""Download-backed datasets (reference: ``EXPWL1Dataset``,
tgp/datasets/expwl1.py:8-63; ``GraphClassificationBench``,
tgp/datasets/graph_classification_bench.py:8-105).

Both require network access; in zero-egress environments they raise with a
pointer to :class:`~tgp_tpu.datasets.synthetic.SyntheticGraphClassification`
as the local stand-in, and accept pre-downloaded ``npz`` files.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path

import numpy as np

__all__ = ["EXPWL1Dataset", "GraphClassificationBench"]


def _load_npz_graphs(path):
    data = np.load(path, allow_pickle=True)
    graphs, labels = [], []
    for x, ei, y in zip(data["x"], data["edge_index"], data["y"]):
        graphs.append((np.asarray(x, np.float32), np.asarray(ei, np.int64)))
        labels.append(int(y))
    return graphs, np.asarray(labels, np.int32)


@dataclass
class EXPWL1Dataset:
    """1-WL expressiveness benchmark (download-backed)."""

    root: str = "data/expwl1"
    url: str = ("https://github.com/FilippoMB/"
                "The-expressive-power-of-pooling-in-GNNs/raw/main/data/"
                "EXPWL1/raw/EXPWL1.zip")

    def load(self):
        path = Path(self.root) / "expwl1.npz"
        if path.exists():
            return _load_npz_graphs(path)
        raise RuntimeError(
            f"EXPWL1 requires a download ({self.url}); not available in "
            "zero-egress environments. Drop a preprocessed npz at "
            f"{path}, or use SyntheticGraphClassification for local runs.")


@dataclass
class GraphClassificationBench:
    """easy/hard × small/full benchmark npz (download-backed)."""

    root: str = "data/gcb"
    split: str = "easy_small"

    def load(self):
        path = Path(self.root) / f"{self.split}.npz"
        if path.exists():
            return _load_npz_graphs(path)
        raise RuntimeError(
            f"GraphClassificationBench ({self.split}) requires a download; "
            f"not available in zero-egress environments. Drop the npz at "
            f"{path}, or use SyntheticGraphClassification for local runs.")
