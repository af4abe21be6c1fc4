"""Cheatsheet / capability probing tests (reference:
tests/utils/test_cheatsheet.py)."""

from tgp_tpu.poolers import pooler_map
from tgp_tpu.utils.cheatsheet import (
    cheatsheet_rows,
    pooler_capabilities,
    render_cheatsheet,
)


def test_capabilities_match_known_poolers():
    pm = pooler_map()
    caps = pooler_capabilities(pm["mincut"])
    assert caps["dense"] and caps["trainable"] and caps["aux_loss"]
    caps = pooler_capabilities(pm["topk"])
    assert caps["sparse"] and caps["trainable"] and not caps["aux_loss"]
    caps = pooler_capabilities(pm["graclus"])
    assert caps["precoarsenable"] and not caps["trainable"]


def test_rows_cover_registry():
    rows = cheatsheet_rows()
    aliases = {r["alias"] for r in rows}
    assert aliases == set(pooler_map())


def test_render_markdown():
    md = render_cheatsheet()
    assert md.startswith("| alias |")
    assert "mincut" in md and "topk" in md
