"""MLP soft-assignment selector (reference: ``MLPSelect``,
tgp/select/mlp_select.py:11-157): ``S = softmax(MLP(X))`` with padded rows
zeroed.  Batched mode consumes a :class:`DenseGraphBatch` → ``s [B,N,K]``;
unbatched mode consumes a flat :class:`GraphBatch` → ``s [N,K]``."""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from tgp_tpu.graph import DenseGraphBatch, GraphBatch
from tgp_tpu.select.base import SelectOutput
from tgp_tpu.utils.activations import resolve_activation

__all__ = ["MLPSelect", "SelectMLP"]


class SelectMLP(nn.Module):
    """Plain MLP head (reference uses PyG ``MLP``, mlp_select.py:29)."""

    channels: Sequence[int]  # hidden widths (excluding output)
    k: int
    act: Optional[str] = None
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        a = resolve_activation(self.act) if self.act else jax.nn.relu
        widths = list(self.channels[1:])  # channels[0] is the input width
        for w in widths:
            x = a(nn.Dense(w)(x))
            if self.dropout > 0:
                x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return nn.Dense(self.k)(x)


class MLPSelect(nn.Module):
    in_channels: Union[int, List[int]] = 0
    k: int = 8
    batched: bool = True
    act: Optional[str] = None
    dropout: float = 0.0
    s_inv_op: str = "transpose"

    @nn.compact
    def __call__(self, batch, deterministic: bool = True) -> SelectOutput:
        # None is fine: flax infers the input width, and channels[0] is only
        # a documentation slot (single hidden-free MLP = one Dense(k))
        ch = ([self.in_channels]
              if self.in_channels is None or isinstance(self.in_channels, int)
              else list(self.in_channels))
        mlp = SelectMLP(channels=ch, k=self.k, act=self.act,
                        dropout=self.dropout)
        if self.batched:
            assert isinstance(batch, DenseGraphBatch), (
                "batched MLPSelect expects a DenseGraphBatch"
            )
            s = jax.nn.softmax(mlp(batch.x, deterministic), axis=-1)
            s = s * batch.mask[..., None]
            return SelectOutput(
                s=s, in_mask=batch.mask,
                num_clusters=self.k, num_graphs=batch.num_graphs,
                max_clusters=self.k, s_inv_op=self.s_inv_op,
            )
        assert isinstance(batch, GraphBatch), (
            "unbatched MLPSelect expects a flat GraphBatch"
        )
        s = jax.nn.softmax(mlp(batch.x, deterministic), axis=-1)
        s = s * batch.node_mask[:, None]
        return SelectOutput(
            s=s, node_graph=batch.node_graph, node_mask=batch.node_mask,
            num_clusters=self.k, num_graphs=batch.num_graphs,
            max_clusters=self.k, s_inv_op=self.s_inv_op,
        )
