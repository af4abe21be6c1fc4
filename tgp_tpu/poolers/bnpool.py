"""BNPool — Bayesian nonparametric pooling (reference:
tgp/poolers/bnpool.py:141-557; Castellana & Bianchi 2025).

DPSelect (stick-breaking posterior) / BaseReduce / DenseConnect / BaseLift,
with a learnable cluster-connectivity matrix ``K`` and three losses:
``quality`` (class-balanced BCE of ``A_rec = SKSᵀ``; sparse mode uses
±edge sampling), ``kl`` (η·KL(q‖Beta(1, α_DP))), and ``K_prior`` (Gaussian).

Needs an RNG stream: call ``pooler.apply(params, batch,
rngs={'sample': key})`` (Beta sampling happens at train *and* eval time,
like the reference's ``rsample``).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from tgp_tpu.connect.base import dense_connect, dense_connect_unbatched
from tgp_tpu.graph import DenseGraphBatch, GraphBatch
from tgp_tpu.losses import (
    beta_kl_divergence,
    cluster_connectivity_prior_loss,
    kl_loss,
    sparse_bce_reconstruction_loss,
    weighted_bce_reconstruction_loss,
)
from tgp_tpu.ops.sampling import negative_edge_sampling
from tgp_tpu.ops.sparse import postprocess_adj_dense
from tgp_tpu.poolers import register_pooler
from tgp_tpu.reduce.base import reduce_dense_batched, reduce_dense_unbatched
from tgp_tpu.select.base import SelectOutput
from tgp_tpu.select.dp import DPSelect
from tgp_tpu.src import DenseSRCPooling, PoolingOutput

__all__ = ["BNPool"]


@register_pooler("bnpool")
class BNPool(DenseSRCPooling):
    in_channels: Union[int, List[int], None] = None
    k: int = 8
    alpha_DP: float = 1.0
    K_var: float = 1.0
    K_mu: float = 10.0
    K_init: float = 1.0
    eta: float = 1.0
    train_K: bool = True
    #: per-graph cap on sampled negative edges in the unbatched sparse-loss
    #: path (reference num_neg_samples, bnpool.py:135-139; None = one
    #: negative per positive edge)
    num_neg_samples: Optional[int] = None
    #: forward to DPSelect: per-node RNG keying makes the Beta draws
    #: layout- and sharding-invariant (required by the sharded path,
    #: tgp_tpu/parallel/dense_pool.py)
    per_node_keys: bool = False
    act: Optional[str] = None
    dropout: float = 0.0
    remove_self_loops: bool = True
    degree_norm: bool = True
    edge_weight_norm: bool = False
    adj_transpose: bool = False
    s_inv_op: str = "transpose"
    batched: bool = True
    sparse_output: bool = False

    IS_TRAINABLE = True
    HAS_LOSS = True

    def setup(self):
        self.selector = DPSelect(
            in_channels=self.in_channels, k=self.k, batched=self.batched,
            act=self.act, dropout=self.dropout, s_inv_op=self.s_inv_op,
            per_node_keys=self.per_node_keys,
        )
        eye = jnp.eye(self.k)
        self.K = self.param(
            "K", lambda key, s: self.K_init * eye - self.K_init * (1 - eye),
            (self.k, self.k))

    def _K_mat(self):
        """K, frozen when ``train_K=False`` (reference: the parameter is
        created with ``requires_grad=train_K``, bnpool.py:220-225 — a
        non-trainable K must not drift under the reconstruction gradient)."""
        return self.K if self.train_K else jax.lax.stop_gradient(self.K)

    def _K_mu_mat(self):
        eye = jnp.eye(self.k)
        return self.K_mu * eye - self.K_mu * (1 - eye)

    def _kl_per_node(self, so: SelectOutput) -> jax.Array:
        a_q, b_q = so.extras["q_alpha"], so.extras["q_beta"]
        a_p = jnp.ones(self.k - 1)
        b_p = jnp.ones(self.k - 1) * self.alpha_DP
        return beta_kl_divergence(a_q, b_q, a_p, b_p).sum(-1)

    def compute_loss(self, dense: DenseGraphBatch, so: SelectOutput
                     ) -> Dict[str, jax.Array]:
        s = so.s
        rec_adj = jnp.einsum("bnk,kj,bmj->bnm", s, self._K_mat(), s)
        N = dense.mask.sum(-1)
        # clip: an all-padding graph row must yield 0, not 0/0 = NaN (the
        # sparse path clips its per-graph count the same way)
        N2 = jnp.maximum((N * N).astype(s.dtype), 1.0)
        rec = weighted_bce_reconstruction_loss(
            rec_adj, dense.adj, mask=dense.mask, balance_links=True,
            normalizing_const=N2)
        kl = kl_loss(self._kl_per_node(so), mask=dense.mask,
                     normalizing_const=N2)
        if self.train_K:
            kp = cluster_connectivity_prior_loss(
                self.K, self._K_mu_mat(), self.K_var, normalizing_const=N2)
        else:
            kp = jnp.zeros(())
        return {"quality": rec, "kl": self.eta * kl, "K_prior": kp}

    def compute_sparse_loss(self, batch: GraphBatch, so: SelectOutput,
                            key: Optional[jax.Array],
                            negatives=None) -> Dict[str, jax.Array]:
        s = so.s
        if negatives is not None:
            # caller-provided negative edges (host-sampled): used by the
            # node-sharded path for exact sharded-vs-single parity
            # (tgp_tpu/parallel/dense_pool.py::prepare_sharded_negatives)
            # and for deterministic evaluation
            neg_s, neg_r, neg_m = negatives
        else:
            neg_s, neg_r, neg_m = negative_edge_sampling(key, batch)
            if self.num_neg_samples is not None:
                from tgp_tpu.ops.sampling import cap_samples_per_graph

                neg_m = cap_samples_per_graph(
                    neg_m, batch.node_graph[neg_s], batch.num_graphs,
                    self.num_neg_samples)
        all_s = jnp.concatenate([batch.senders, neg_s])
        all_r = jnp.concatenate([batch.receivers, neg_r])
        all_m = jnp.concatenate([batch.edge_mask, neg_m])
        logits = jnp.sum((s[all_s] @ self._K_mat()) * s[all_r], -1)
        y = jnp.concatenate([
            jnp.ones(batch.num_edges), jnp.zeros(neg_s.shape[0])])
        eg = batch.node_graph[all_s]
        rec, cnt = sparse_bce_reconstruction_loss(
            logits, y, edges_graph=eg, num_graphs=batch.num_graphs,
            sample_mask=all_m)
        kl = kl_loss(self._kl_per_node(so), node_graph=batch.node_graph,
                     num_graphs=batch.num_graphs, node_mask=batch.node_mask,
                     normalizing_const=cnt)
        if self.train_K:
            kp = cluster_connectivity_prior_loss(
                self.K, self._K_mu_mat(), self.K_var, normalizing_const=cnt)
        else:
            kp = jnp.zeros(())
        return {"quality": rec, "kl": self.eta * kl, "K_prior": kp}

    def __call__(self, batch, *, so: Optional[SelectOutput] = None,
                 lifting: bool = False, x: Optional[jax.Array] = None,
                 deterministic: bool = True, negatives=None):
        if lifting:
            return self.lift(x if x is not None else batch.x, so)

        if self.batched:
            dense = self.ensure_dense(batch, self.adj_transpose)
            if so is None:
                so = self.selector(dense, deterministic)
            x_pool = reduce_dense_batched(dense.x, so.s)
            adj_pool = dense_connect(dense.adj, so.s)
            loss = self.compute_loss(dense, so)
            adj_pool = postprocess_adj_dense(
                adj_pool,
                remove_self_loops_flag=self.remove_self_loops,
                degree_norm=self.degree_norm,
                edge_weight_norm=self.edge_weight_norm,
                adj_transpose=self.adj_transpose,
            )
            out = DenseGraphBatch(x=x_pool, adj=adj_pool, mask=so.out_mask())
        else:
            if so is None:
                so = self.selector(batch, deterministic)
            loss = self.compute_sparse_loss(
                batch, so,
                None if negatives is not None else self.make_rng("sample"),
                negatives=negatives)
            x_pool = reduce_dense_unbatched(
                batch.x, so.s, batch.node_graph, batch.num_graphs,
                batch.node_mask)
            adj_pool = dense_connect_unbatched(
                batch.senders, batch.receivers, batch.edge_weight, so.s,
                batch.node_graph, batch.num_graphs, batch.node_mask)
            adj_pool = postprocess_adj_dense(
                adj_pool,
                remove_self_loops_flag=self.remove_self_loops,
                degree_norm=self.degree_norm,
                edge_weight_norm=self.edge_weight_norm,
                adj_transpose=self.adj_transpose,
            )
            out = DenseGraphBatch(x=x_pool, adj=adj_pool, mask=so.out_mask())

        if self.sparse_output:
            return PoolingOutput(so=so, graph=self.finalize_sparse_output(out),
                                 loss=loss)
        return PoolingOutput(so=so, dense=out, loss=loss)
