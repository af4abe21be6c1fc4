"""Golden-file regression tests (SURVEY §7 verification protocol, adapted:
the reference stack can't run in this image, so the goldens are OUR fixed-
seed outputs — they freeze numerical behavior across refactors/rounds).

Regenerate intentionally with:
    REGEN_GOLDENS=1 python -m pytest tests/test_goldens.py
"""

import os
from pathlib import Path

import jax
import numpy as np
import pytest

from tgp_tpu.poolers import get_pooler
from tests.utils_graphs import make_batch

GOLDEN_DIR = Path(__file__).parent / "goldens"
ALIASES = ["topk", "sag", "ec", "kmis", "graclus", "maxcut", "mincut",
           "diff", "dmon", "hosc", "jb", "acc", "lap", "nopool"]


def _run(alias):
    b = make_batch([9, 6, 12], num_features=5, seed=42, weighted=True,
                   pad_nodes=32, pad_edges=160)
    pooler = get_pooler(alias, in_channels=5, ratio=0.5, k=4)
    params = pooler.init(jax.random.key(42), b)
    out = pooler.apply(params, b)
    x = out.graph.x if out.graph is not None else out.dense.x
    rec = {"x": np.asarray(x)}
    for name, v in out.loss.items():
        rec[f"loss_{name}"] = np.asarray(v)
    if out.so.is_sparse:
        # padding nodes' assignment is arbitrary (changes with the MIS/
        # matching implementation) — pin them to -1 before comparing
        mask = np.asarray(b.node_mask)
        rec["cluster_index"] = np.where(
            mask, np.asarray(out.so.cluster_index), -1)
    return rec


@pytest.mark.parametrize("alias", ALIASES)
def test_golden(alias):
    path = GOLDEN_DIR / f"{alias}.npz"
    rec = _run(alias)
    if os.environ.get("REGEN_GOLDENS") or not path.exists():
        GOLDEN_DIR.mkdir(exist_ok=True)
        np.savez_compressed(path, **rec)
        pytest.skip(f"golden regenerated: {path}")
    golden = np.load(path)
    assert set(golden.files) == set(rec), alias
    for key in rec:
        if rec[key].dtype.kind in "iub":
            np.testing.assert_array_equal(rec[key], golden[key],
                                          err_msg=f"{alias}:{key}")
        else:
            np.testing.assert_allclose(rec[key], golden[key], rtol=1e-4,
                                       atol=1e-5, err_msg=f"{alias}:{key}")
