"""Dataset classes (reference: tgp/datasets/, SURVEY §2.9).

Local generators (CSBM, multipartite, synthetic benchmark) work everywhere;
download-backed datasets (EXPWL1, GraphClassificationBench, Gset) require
network access and raise a clear error in zero-egress environments, exposing
``from_file`` parsers instead.
"""

from tgp_tpu.datasets.csbm import CSBMDataset
from tgp_tpu.datasets.gset import GsetDataset, parse_gset
from tgp_tpu.datasets.multipartite import MultipartiteGraphDataset
from tgp_tpu.datasets.synthetic import SyntheticGraphClassification, csbm_graph
from tgp_tpu.datasets.downloads import (
    EXPWL1Dataset,
    GraphClassificationBench,
)
from tgp_tpu.datasets.pygsp import PYGSP_GRAPHS, PyGSPDataset, pygsp_graph
from tgp_tpu.datasets.tudataset import TUDataset, parse_tu_dir

__all__ = [
    "CSBMDataset",
    "GsetDataset",
    "parse_gset",
    "MultipartiteGraphDataset",
    "SyntheticGraphClassification",
    "csbm_graph",
    "EXPWL1Dataset",
    "GraphClassificationBench",
    "PyGSPDataset",
    "pygsp_graph",
    "PYGSP_GRAPHS",
    "TUDataset",
    "parse_tu_dir",
]
