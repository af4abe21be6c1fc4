"""End-to-end model assemblies (the reference's example ``Net``s).

:class:`PoolingClassifier` mirrors ``examples/classification.py:96-121``:
MP → pool → MP on the pooled graph → global readout → linear head, with the
pooler's aux losses surfaced for the training loss.
"""

from __future__ import annotations

import inspect
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from tgp_tpu.graph import DenseGraphBatch, GraphBatch
from tgp_tpu.mp.gcn import GCNConv
from tgp_tpu.reduce.global_reduce import global_reduce
from tgp_tpu.src import PoolingOutput

__all__ = ["PoolingClassifier"]


class PoolingClassifier(nn.Module):
    """GCN → pool → GCN → readout → linear classifier.

    Accepts a sparse :class:`GraphBatch` (scatter/Pallas SpMM pipeline) or a
    dense :class:`DenseGraphBatch` (scatter-free MXU pipeline) — route small
    graph batches to the dense side with
    :func:`~tgp_tpu.models.prepare.prepare_batch` (model-level regime map).
    """

    pooler: nn.Module
    num_classes: int
    hidden: int = 64
    num_pre_layers: int = 1
    num_post_layers: int = 1
    readout: str = "sum"
    #: Pallas SpMM on sorted-edge input batches; None = measured
    #: regime map (ops.sparse.use_pallas_spmm)
    use_pallas: Optional[bool] = None
    #: rematerialize MP-layer activations in the backward pass
    #: (jax.checkpoint): trades ~1 extra forward of FLOPs for O(layers)
    #: less activation HBM — the standard lever for deep stacks / large N
    remat: bool = False
    #: dense input: the adjacency is already GCN-normalized (pair with
    #: ``prepare_batch(..., normalize=True)`` — normalize the static
    #: adjacency ONCE outside the step, not twice per layer per step)
    pre_normalized: bool = False
    #: dense input: skip per-layer padding masks.  Safe when the pooler
    #: masks scores/assignments itself (topk and the dense cluster family
    #: do) and the readout is masked — saves 2 full [B,N,F] HBM passes per
    #: layer.
    fast_masks: bool = False
    #: matmul compute dtype for the MP layers (params stay f32);
    #: jnp.bfloat16 doubles MXU rate and halves feature HBM traffic
    compute_dtype: Optional[object] = None

    @nn.compact
    def __call__(self, batch: Union[GraphBatch, DenseGraphBatch],
                 deterministic: bool = True
                 ) -> Tuple[jax.Array, PoolingOutput]:
        """``deterministic=False`` enables the pooler's stochastic layers
        (e.g. ASAP's attention dropout, the dense family's selector
        dropout) — supply a ``dropout`` rng stream via
        ``model.apply(..., rngs={"dropout": key})`` (ADVICE r4: the flag
        must be threadable from the model, not only on direct pooler
        calls)."""
        # explicit names keep the param tree identical with/without remat
        # (nn.remat changes the auto-generated module name)
        Conv = nn.remat(GCNConv) if self.remat else GCNConv
        is_dense_in = isinstance(batch, DenseGraphBatch)
        x = batch.x
        if is_dense_in and self.compute_dtype is not None:
            x = x.astype(self.compute_dtype)
        for i in range(self.num_pre_layers):
            if is_dense_in:
                x = nn.relu(Conv(self.hidden,
                                 normalize=not self.pre_normalized,
                                 mask_output=not self.fast_masks,
                                 dtype=self.compute_dtype,
                                 use_pallas=self.use_pallas,
                                 name=f"pre_conv_{i}")(batch, x))
            else:
                x = nn.relu(Conv(self.hidden, use_pallas=self.use_pallas,
                                 dtype=self.compute_dtype,
                                 name=f"pre_conv_{i}")(batch, x))
        batch = batch.with_features(x)

        pool_kw = {}
        if "deterministic" in inspect.signature(
                type(self.pooler).__call__).parameters:
            pool_kw["deterministic"] = deterministic
        out: PoolingOutput = self.pooler(batch, **pool_kw)

        if out.graph is not None:
            pooled = out.graph
            h = pooled.x
            for i in range(self.num_post_layers):
                h = nn.relu(Conv(self.hidden, use_pallas=self.use_pallas,
                                 dtype=self.compute_dtype,
                                 name=f"post_conv_{i}")(pooled, h))
            z = global_reduce(
                h.astype(jnp.float32), node_graph=pooled.node_graph,
                num_graphs=pooled.num_graphs,
                node_mask=pooled.node_mask, op=self.readout,
            )
        else:
            pooled = out.dense
            h = pooled.x
            for i in range(self.num_post_layers):
                h = nn.relu(Conv(self.hidden,
                                 mask_output=not self.fast_masks,
                                 dtype=self.compute_dtype,
                                 use_pallas=self.use_pallas,
                                 name=f"post_conv_{i}")(pooled, h))
            z = global_reduce(h.astype(jnp.float32), mask=pooled.mask,
                              op=self.readout)

        z = nn.relu(nn.Dense(self.hidden)(z))
        logits = nn.Dense(self.num_classes)(z)
        return logits, out
