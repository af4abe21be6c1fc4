"""MaxCut selection (reference: tgp/select/maxcut_select.py:18-308; Abate &
Bianchi, ICLR 2025).

``MaxCutScoreNet``: Linear → stack of GCN propagations over the δ-GCN matrix
``P = I − δ·L_sym`` (heterophilic) → MLP → tanh score.  Selection = top-k on
the score, then :func:`~tgp_tpu.ops.assignment.assign_all_nodes` upgrades the
partial selection to a total assignment; scores are stored in ``extras`` for
the maxcut loss.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from tgp_tpu.graph import GraphBatch
from tgp_tpu.ops.assignment import assign_all_nodes
from tgp_tpu.ops.lap import delta_gcn_matrix
from tgp_tpu.ops.sparse import spmm
from tgp_tpu.select.base import SelectOutput
from tgp_tpu.select.topk import topk_select_from_scores
from tgp_tpu.utils.activations import resolve_activation

__all__ = ["MaxCutScoreNet", "MaxCutSelect"]

_DEFAULT_MP = (32, 32, 32, 32, 16, 16, 16, 16, 8, 8, 8, 8)


class MaxCutScoreNet(nn.Module):
    in_channels: int = 0
    mp_units: Sequence[int] = _DEFAULT_MP
    mp_act: str = "tanh"
    mlp_units: Sequence[int] = (16, 16)
    mlp_act: str = "relu"
    act: str = "tanh"
    delta: float = 2.0
    #: ``'dense'`` densifies P once per call and runs the (default 12)
    #: propagation rounds as batched matmuls on the MXU — at pooling scales
    #: one XLA scatter SpMM costs more than ALL the bmm rounds together;
    #: ``'auto'`` picks dense under the B·Nmax² memory budget
    mp_impl: str = "auto"  # 'auto' | 'dense' | 'sparse'

    @nn.compact
    def __call__(self, batch: GraphBatch) -> jax.Array:
        from tgp_tpu.ops.sparse import use_dense_vote

        s, r, w, m = delta_gcn_matrix(
            batch.senders, batch.receivers, batch.edge_weight, batch.edge_mask,
            batch.node_mask, batch.num_nodes, self.delta)
        w = jnp.where(m, w, 0.0)
        impl = self.mp_impl
        if impl == "auto":
            impl = ("dense" if use_dense_vote(
                batch.num_graphs, batch.max_nodes) else "sparse")
        a_mp = resolve_activation(self.mp_act)
        # in_channels=0 (the "infer" default) must fall back to the input
        # width — Dense(features=0) silently produces a [N, 0] tensor and
        # every later layer emits bias-only constant scores
        x = nn.Dense(self.in_channels or batch.x.shape[-1])(batch.x)
        if impl == "dense":
            B, Nm = batch.num_graphs, batch.max_nodes
            ng, np_ = batch.node_graph, batch.node_pos
            g = ng[s]
            # padding entries carry w=0 and .add-combine — never corrupt a
            # real cell (cf. graph.py:228-229 padding aliasing)
            # row = receiver: einsum's out[b,n] = Σ_m P[b,n,m]·x[b,m] must
            # equal spmm's out[r] = Σ_{e: recv=r} w_e·x[send_e]
            P = jnp.zeros((B, Nm, Nm), w.dtype).at[g, np_[r], np_[s]].add(w)
            x = jnp.zeros((B, Nm, x.shape[-1]), x.dtype).at[ng, np_].add(
                jnp.where(batch.node_mask[:, None], x, 0.0))
            for i, width in enumerate(self.mp_units):
                h = nn.Dense(width, use_bias=False)(x)
                h = jnp.einsum("bnm,bmf->bnf", P, h)
                b = self.param(f"mp_bias_{i}", nn.initializers.zeros,
                               (width,))
                x = a_mp(h + b)
        else:
            for i, width in enumerate(self.mp_units):
                # GCNConv(normalize=False) over P: x' = P·(X W) + b — PyG
                # puts the bias AFTER propagation (GCNConv.forward), so P·b
                # never appears.
                h = nn.Dense(width, use_bias=False)(x)
                h = spmm(s, r, w, h, batch.num_nodes)
                b = self.param(f"mp_bias_{i}", nn.initializers.zeros,
                               (width,))
                x = a_mp(h + b)
        a_mlp = resolve_activation(self.mlp_act)
        for width in self.mlp_units:
            x = a_mlp(nn.Dense(width)(x))
        score = nn.Dense(1)(x)
        score = resolve_activation(self.act)(score[..., 0])
        if impl == "dense":
            score = score[batch.node_graph, batch.node_pos]
        return score


class MaxCutSelect(nn.Module):
    in_channels: int = 0
    ratio: Union[int, float] = 0.5
    do_assign_all_nodes: bool = True
    max_iter: int = 5
    mp_units: Sequence[int] = _DEFAULT_MP
    mp_act: str = "tanh"
    mlp_units: Sequence[int] = (16, 16)
    mlp_act: str = "relu"
    act: str = "tanh"
    delta: float = 2.0
    min_score: Optional[float] = None
    s_inv_op: str = "transpose"
    mp_impl: str = "auto"  # 'auto' | 'dense' | 'sparse'

    @nn.compact
    def __call__(self, batch: GraphBatch) -> SelectOutput:
        scores = MaxCutScoreNet(
            in_channels=self.in_channels, mp_units=self.mp_units,
            mp_act=self.mp_act, mlp_units=self.mlp_units,
            mlp_act=self.mlp_act, act=self.act, delta=self.delta,
            mp_impl=self.mp_impl,
        )(batch)
        scores = jnp.where(batch.node_mask, scores, 0.0)
        so = topk_select_from_scores(
            scores, batch, self.ratio, self.min_score, self.s_inv_op)
        if self.do_assign_all_nodes:
            so = assign_all_nodes(
                so, batch.senders, batch.receivers, batch.edge_mask,
                max_iter=self.max_iter, weight=scores,
                node_pos=batch.node_pos, max_nodes=batch.max_nodes,
                impl=self.mp_impl)
        return so.with_extra(scores=scores)
