"""Graph-level readout (reference: ``GlobalReduce``,
tgp/reduce/global_reduce.py:22-95): sparse ``[N,F]``+node_graph or dense
``[B,N,F]``+mask → ``[B,F]``."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from tgp_tpu.ops.segment import (segment_max, segment_mean,
                                 segment_min, segment_sum)

__all__ = ["global_reduce"]


def global_reduce(x: jax.Array, *, node_graph: Optional[jax.Array] = None,
                  num_graphs: Optional[int] = None,
                  node_mask: Optional[jax.Array] = None,
                  mask: Optional[jax.Array] = None,
                  op: str = "sum") -> jax.Array:
    """Readout. Sparse mode: ``x [N,F]`` with ``node_graph``/``node_mask``.
    Dense mode: ``x [B,N,F]`` with ``mask [B,N]``."""
    if x.ndim == 3:
        m = mask[..., None] if mask is not None else jnp.ones_like(x[..., :1])
        if op == "sum":
            return jnp.sum(jnp.where(m, x, 0.0), axis=1)
        if op == "mean":
            s = jnp.sum(jnp.where(m, x, 0.0), axis=1)
            c = jnp.clip(m.sum(1), 1.0, None)
            return s / c
        if op == "max":
            out = jnp.max(jnp.where(m, x, -jnp.inf), axis=1)
            # empty graph (all-False mask row): neutral 0, not -inf — one
            # empty graph must not poison the whole batch loss
            return jnp.where(jnp.isfinite(out), out, 0.0)
        if op == "min":
            out = jnp.min(jnp.where(m, x, jnp.inf), axis=1)
            return jnp.where(jnp.isfinite(out), out, 0.0)
        raise ValueError(f"unknown op {op!r}")
    if node_mask is None:
        node_mask = mask  # accept either spelling in sparse mode
    if op == "sum":
        return segment_sum(x, node_graph, num_graphs, mask=node_mask)
    if op == "mean":
        return segment_mean(x, node_graph, num_graphs, mask=node_mask)
    if op == "max":
        out = segment_max(x, node_graph, num_graphs, mask=node_mask)
        return jnp.where(jnp.isfinite(out), out, 0.0)
    if op == "min":
        out = segment_min(x, node_graph, num_graphs, mask=node_mask)
        return jnp.where(jnp.isfinite(out), out, 0.0)
    raise ValueError(f"unknown op {op!r}")
