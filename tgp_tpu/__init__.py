"""tgp_tpu — TPU-native hierarchical graph pooling framework.

A from-scratch JAX/XLA/Pallas implementation of the SRC(L) graph pooling
framework (Select, Reduce, Connect, Lift) with the full capability surface of
the reference library ``torch-geometric-pool`` (see SURVEY.md), re-designed
for TPU: static-shape padded graph batches, masked (not compacted) sparse
connectivity, einsum/MXU dense coarsening, segment-op sparse kernels, and
pjit/shard_map multi-device scaling.

Reference parity map: /root/reference/tgp/__init__.py (lazy submodule exports,
package constant ``eps``).
"""

from __future__ import annotations

import importlib
from typing import TYPE_CHECKING

__version__ = "0.1.0"

#: Numerical epsilon used across losses and normalizations
#: (reference: tgp/__init__.py:6).
eps = 1e-8

_SUBMODULES = {
    "graph",
    "ops",
    "select",
    "reduce",
    "connect",
    "lift",
    "poolers",
    "losses",
    "mp",
    "data",
    "datasets",
    "parallel",
    "models",
    "utils",
    "src",
}

_TOPLEVEL = {
    "GraphBatch": ("tgp_tpu.graph", "GraphBatch"),
    "DenseGraphBatch": ("tgp_tpu.graph", "DenseGraphBatch"),
    "SelectOutput": ("tgp_tpu.select", "SelectOutput"),
    "PoolingOutput": ("tgp_tpu.src", "PoolingOutput"),
    "SRCPooling": ("tgp_tpu.src", "SRCPooling"),
    "DenseSRCPooling": ("tgp_tpu.src", "DenseSRCPooling"),
    "get_pooler": ("tgp_tpu.poolers", "get_pooler"),
    "pooler_map": ("tgp_tpu.poolers", "pooler_map"),
}


def __getattr__(name: str):
    """Lazy submodule/symbol loading (reference: tgp/__init__.py:12-34)."""
    if name in _SUBMODULES:
        return importlib.import_module(f"tgp_tpu.{name}")
    if name in _TOPLEVEL:
        mod, sym = _TOPLEVEL[name]
        return getattr(importlib.import_module(mod), sym)
    raise AttributeError(f"module 'tgp_tpu' has no attribute {name!r}")


def __dir__():
    return sorted(set(globals()) | _SUBMODULES | set(_TOPLEVEL))


if TYPE_CHECKING:  # pragma: no cover
    from tgp_tpu.graph import DenseGraphBatch, GraphBatch  # noqa: F401
    from tgp_tpu.poolers import get_pooler, pooler_map  # noqa: F401
    from tgp_tpu.select import SelectOutput  # noqa: F401
    from tgp_tpu.src import (  # noqa: F401
        DenseSRCPooling,
        PoolingOutput,
        SRCPooling,
    )
