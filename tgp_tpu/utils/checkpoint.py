"""Checkpointing and artifact persistence (SURVEY §5: the reference has no
checkpoint subsystem beyond ``state_dict``; its nearest analogue is
precoarsening-as-persisted-computation inside the PyG dataset cache.
The TPU build uses Orbax for parameters and an npz artifact cache for
precoarsened graphs, keyed by the coarsening config)."""

from __future__ import annotations

import hashlib
import json
import os
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
    def graph_hash(x: np.ndarray, edge_index: np.ndarray,
                   edge_weight: Optional[np.ndarray] = None) -> str:
        h = hashlib.sha256()
        # shape+dtype headers disambiguate raw byte streams: without them a
        # [4,2] and a [2,4] feature matrix (or an x/edge_index boundary
        # shift) hash identically and serve the wrong cached coarsening
        for arr in (x, edge_index):
            a = np.ascontiguousarray(arr)
            h.update(repr((a.shape, a.dtype.str)).encode())
            h.update(a.tobytes())
        # weights are part of the identity: graclus matching / Kron damping
        # depend on them, so same-topology-different-weights graphs must
        # not collide on one cache entry
        if edge_weight is not None:
            a = np.ascontiguousarray(edge_weight)
            h.update(repr((a.shape, a.dtype.str)).encode())
            h.update(a.tobytes())
        return h.hexdigest()[:16]

    def get(self, config, graph_hash: str) -> Optional[List[dict]]:
        path = self._path(config, graph_hash)
        if not path.exists():
            return None
        try:
            data = np.load(path, allow_pickle=True)
            return list(data["levels"])
        except Exception:
            # a truncated/corrupt entry (interrupted write of an older
            # version) is a miss, not a permanent poison
            path.unlink(missing_ok=True)
            return None

    def put(self, config, graph_hash: str, levels: Sequence[dict]) -> None:
        path = self._path(config, graph_hash)
        # atomic publish: never leave a half-written npz at the final name
        # (the tmp name must keep the .npz suffix — np.savez appends it
        # otherwise and the rename source would not exist)
        tmp = path.parent / f"{path.stem}.tmp{os.getpid()}.npz"
        np.savez_compressed(tmp, levels=np.asarray(levels, dtype=object))
        os.replace(tmp, path)

    def precoarsen_with_cache(self, transform, graphs: Sequence) -> List:
        """Apply a :class:`~tgp_tpu.precoarsen.PreCoarsening` transform with
        caching.  ``transform`` must expose ``poolers``/``levels``/``kwargs``
        for the config key."""
        from tgp_tpu.data.transforms import split_graph_tuple

        config = {
            "poolers": transform.poolers,
            "levels": transform.levels,
            "kwargs": transform.kwargs,
        }
        out = []
        for g in graphs:
            x, ei, ew, y = split_graph_tuple(g)
            gh = self.graph_hash(x, ei, ew)
            cached = self.get(config, gh)
            if cached is not None:
                # same tuple shape as the cold transform(g) path: the
                # explicit-None weight slot is dropped there too
                base = ((x, ei) + ((ew,) if ew is not None else ())
                        + ((y,) if y is not None else ()))
                out.append(base + (cached,))
                continue
            res = transform(g)
            self.put(config, gh, res[-1])
            out.append(res)
        return out
