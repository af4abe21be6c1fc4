"""Pooler capability cheatsheet (reference: tgp/utils/cheatsheet.py:27-165):
probes each registered pooler's capability flags for docs/introspection."""

from __future__ import annotations

import re
from typing import Dict, List

__all__ = ["pooler_capabilities", "cheatsheet_rows", "render_cheatsheet"]

_PAPER_RE = re.compile(r"https?://\S+|\(([^)]*\d{4}[^)]*)\)")


def pooler_capabilities(cls) -> Dict[str, bool]:
    """Capability flags (reference probes ``supports_sparse / trainable /
    aux_loss``, cheatsheet.py:27-75)."""
    return {
        "sparse": not getattr(cls, "IS_DENSE", False),
        "dense": bool(getattr(cls, "IS_DENSE", False)),
        "trainable": bool(getattr(cls, "IS_TRAINABLE", False)),
        "aux_loss": bool(getattr(cls, "HAS_LOSS", False)),
        "precoarsenable": bool(getattr(cls, "IS_PRECOARSENABLE", False)),
    }


def _paper_refs(cls) -> List[str]:
    doc = cls.__doc__ or ""
    return [m.group(0) for m in _PAPER_RE.finditer(doc)][:2]


def cheatsheet_rows() -> List[dict]:
    from tgp_tpu.poolers import pooler_map

    rows = []
    for alias, cls in sorted(pooler_map().items()):
        caps = pooler_capabilities(cls)
        rows.append({"alias": alias, "class": cls.__name__, **caps,
                     "refs": _paper_refs(cls)})
    return rows


def render_cheatsheet() -> str:
    """Markdown capability table (the reference renders an equivalent jinja
    table into docs, docs/source/poolers_cheatsheet.rst:15-31)."""
    rows = cheatsheet_rows()
    head = ("| alias | class | sparse | dense | trainable | aux loss | "
            "precoarsenable |\n|---|---|---|---|---|---|---|")
    body = "\n".join(
        "| {alias} | {class} | {s} | {d} | {t} | {l} | {p} |".format(
            alias=r["alias"], **{"class": r["class"]},
            s="✓" if r["sparse"] else "",
            d="✓" if r["dense"] else "",
            t="✓" if r["trainable"] else "",
            l="✓" if r["aux_loss"] else "",
            p="✓" if r["precoarsenable"] else "")
        for r in rows)
    return head + "\n" + body
