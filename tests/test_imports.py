"""Public API surface tests (reference: tests/test_imports.py — lazy
submodule loading)."""

import tgp_tpu


def test_lazy_toplevel_exports():
    assert tgp_tpu.eps == 1e-8
    assert tgp_tpu.GraphBatch is not None
    assert tgp_tpu.SelectOutput is not None
    assert tgp_tpu.PoolingOutput is not None
    assert callable(tgp_tpu.get_pooler)
    assert "mincut" in tgp_tpu.pooler_map()


def test_lazy_submodules():
    assert tgp_tpu.losses.mincut_loss is not None
    assert tgp_tpu.ops.segment_sum is not None
    assert hasattr(tgp_tpu.utils, "resolve_activation")


def test_dir_lists_api():
    d = dir(tgp_tpu)
    for name in ("poolers", "losses", "GraphBatch", "get_pooler"):
        assert name in d
