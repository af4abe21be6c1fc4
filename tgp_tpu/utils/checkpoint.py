"""Checkpointing and artifact persistence (SURVEY §5: the reference has no
checkpoint subsystem beyond ``state_dict``; its nearest analogue is
precoarsening-as-persisted-computation inside the PyG dataset cache.
The TPU build uses Orbax for parameters and an npz artifact cache for
precoarsened graphs, keyed by the coarsening config)."""

from __future__ import annotations

import hashlib
import json
from pathlib import Path
from typing import Any, List, Optional, Sequence

import numpy as np

__all__ = ["save_params", "restore_params", "PrecoarsenCache"]


def save_params(path, params) -> None:
    """Save a params pytree with Orbax."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(path, params, force=True)
    ckpt.wait_until_finished()


def restore_params(path, like=None):
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    ckpt = ocp.StandardCheckpointer()
    if like is not None:
        return ckpt.restore(path, like)
    return ckpt.restore(path)


def _config_key(config: Any) -> str:
    blob = json.dumps(config, sort_keys=True, default=str).encode()
    return hashlib.sha256(blob).hexdigest()[:16]


class PrecoarsenCache:
    """Disk cache for per-graph precoarsening artifacts, keyed by the
    coarsening config (mirroring the reference's ``PreCoarsening`` collapse
    keys + PyG ``pre_transform`` dataset cache,
    tgp/data/transforms.py:332-368)."""

    def __init__(self, root: str = "data/precoarsen_cache"):
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)

    def _path(self, config, graph_hash: str) -> Path:
        return self.root / f"{_config_key(config)}_{graph_hash}.npz"

    @staticmethod
    def graph_hash(x: np.ndarray, edge_index: np.ndarray) -> str:
        h = hashlib.sha256()
        h.update(np.ascontiguousarray(x).tobytes())
        h.update(np.ascontiguousarray(edge_index).tobytes())
        return h.hexdigest()[:16]

    def get(self, config, graph_hash: str) -> Optional[List[dict]]:
        path = self._path(config, graph_hash)
        if not path.exists():
            return None
        data = np.load(path, allow_pickle=True)
        return list(data["levels"])

    def put(self, config, graph_hash: str, levels: Sequence[dict]) -> None:
        path = self._path(config, graph_hash)
        np.savez_compressed(path, levels=np.asarray(levels, dtype=object))

    def precoarsen_with_cache(self, transform, graphs: Sequence) -> List:
        """Apply a :class:`~tgp_tpu.precoarsen.PreCoarsening` transform with
        caching.  ``transform`` must expose ``poolers``/``levels``/``kwargs``
        for the config key."""
        config = {
            "poolers": transform.poolers,
            "levels": transform.levels,
            "kwargs": transform.kwargs,
        }
        out = []
        for g in graphs:
            gh = self.graph_hash(np.asarray(g[0]), np.asarray(g[1]))
            cached = self.get(config, gh)
            if cached is not None:
                out.append(tuple(g) + (cached,))
                continue
            res = transform(g)
            self.put(config, gh, res[-1])
            out.append(res)
        return out
