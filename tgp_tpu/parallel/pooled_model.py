"""Sharded end-to-end pooled-model forward for LARGE single graphs.

VERDICT r1 #3: the parallel layer must cover the whole GCN → pool → GCN
stack, not just one SpMM.  Design (new TPU-first work — the reference has no
distributed layer, SURVEY §2.12):

* **node sharding**: device ``d`` owns rows ``[d·rows_per, (d+1)·rows_per)``
  of ``x``; edges are partitioned by receiver owner (``partition_edges``).
* **MP layer**: edge-partitioned SpMM — ``all_gather`` of the feature shard
  over ICI, local gather+segment-sum (``parallel/spmm.py``).
* **distributed top-k select** (exact): scores are computed locally,
  ``all_gather``-ed ([N] floats — tiny), and ranked identically on every
  device; node with global rank ``t`` becomes supernode ``t < K``.
* **coarse-graph repartition**: supernode ``t`` lives on device
  ``t // (K/D)``; pooled features are sliced out of the gathered score-gated
  features, so each device ends up with a balanced ``[K/D, H]`` shard no
  matter where the selected nodes came from.
* **coarse MP**: every device relabels ITS original edges through the rank
  table (edges whose endpoints were both kept), scatters messages into the
  full ``[K, H]`` coarse row space and ``psum``s — correct for any edge
  placement; the coarse graph is small, so the ``psum`` of ``[K, H]`` is
  cheap.
* **readout**: masked local sum + ``psum``.

Everything is static-shape; the only cross-device primitives are
``all_gather`` and ``psum`` (XLA maps both onto ICI rings).  The v1
collective choice (gather-everything) favors simplicity — the ring-halo
``ppermute`` variant from ``parallel/spmm.py`` drops peak memory to
``O(rows_per·F)`` when N·F stops fitting.
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from tgp_tpu.parallel.spmm import partition_edges

__all__ = ["init_pooled_params", "make_sharded_pooled_forward",
           "reference_pooled_forward", "prepare_sharded_graph", "level_ks"]


def level_ks(num_valid: int, ratio: float, num_levels: int,
             n_devices: int):
    """Per-level supernode counts: ``ceil(ratio·n)`` rounded up to a
    device-count multiple.  The single source of truth shared by the
    sharded forward and the hybrid train step — they must agree bit-exactly
    or the hybrid step silently builds a different model."""
    if num_levels < 1:
        raise ValueError("num_levels must be >= 1 (a pool-free GCN has no "
                         "pooled readout path here)")
    ks = []
    cur = num_valid
    for _ in range(num_levels):
        k = max(int(math.ceil(ratio * cur)), 1)
        k = ((k + n_devices - 1) // n_devices) * n_devices
        ks.append(k)
        cur = k
    return tuple(ks)


def init_pooled_params(key, in_features: int, hidden: int, num_classes: int,
                       num_levels: int = 1) -> Dict[str, jax.Array]:
    keys = jax.random.split(key, 2 + 2 * num_levels)
    g = jax.nn.initializers.glorot_uniform()
    bound = 1.0 / math.sqrt(hidden)
    params = {
        "W1": g(keys[0], (in_features, hidden)),
        "b1": jnp.zeros(hidden),
        "Wh": g(keys[1], (hidden, num_classes)),
        "bh": jnp.zeros(num_classes),
    }
    for l in range(num_levels):
        params[f"p{l}"] = jax.random.uniform(
            keys[2 + 2 * l], (hidden,), minval=-bound, maxval=bound)
        params[f"W{l + 2}"] = g(keys[3 + 2 * l], (hidden, hidden))
        params[f"b{l + 2}"] = jnp.zeros(hidden)
    return params


def prepare_sharded_graph(senders, receivers, edge_weight, num_nodes: int,
                          n_devices: int):
    """Host-side prep: GCN-normalize (A+I) edge weights, then partition by
    receiver owner.  Returns ``(S, R, W  [D, E_local], n_pad, rows_per)``
    with R in LOCAL row coordinates and S in GLOBAL coordinates."""
    senders = np.asarray(senders)
    receivers = np.asarray(receivers)
    w = (np.ones(senders.shape[0], np.float32) if edge_weight is None
         else np.asarray(edge_weight, np.float32))
    # add self loops + symmetric normalization (host, once per graph)
    loops = np.arange(num_nodes)
    s_all = np.concatenate([senders, loops])
    r_all = np.concatenate([receivers, loops])
    w_all = np.concatenate([w, np.ones(num_nodes, np.float32)])
    deg = np.zeros(num_nodes, np.float32)
    np.add.at(deg, s_all, w_all)
    dinv = 1.0 / np.sqrt(np.clip(deg, 1e-12, None))
    w_all = w_all * dinv[s_all] * dinv[r_all]
    return partition_edges(s_all, r_all, w_all, num_nodes, n_devices)


def _forward_local(params, x_local, S_d, R_d, W_d, *, rows_per: int,
                   num_valid: int, ks, axis: str):
    """Per-device body (runs under shard_map).  ``ks``: per-level supernode
    counts (each a multiple of the device count)."""
    d = jax.lax.axis_index(axis)
    n_dev = jax.lax.axis_size(axis)

    # ---- GCN layer 1 (edge-partitioned SpMM over the gathered X) --------
    h_local = x_local @ params["W1"]
    h_full = jax.lax.all_gather(h_local, axis, tiled=True)  # [n_pad, H]
    msgs = h_full[S_d] * W_d[:, None]
    h = jax.ops.segment_sum(msgs, R_d, num_segments=rows_per)
    h = jax.nn.relu(h + params["b1"])  # sharded [rows_per, H]

    # edge endpoints in GLOBAL coordinates (relabelled at every level)
    s_glob = S_d
    r_glob = d * rows_per + R_d
    w_e = W_d
    cur_valid, cur_rows = num_valid, rows_per
    h_glob = None

    for level, k_total in enumerate(ks):
        k_per = k_total // n_dev
        # ---- distributed exact top-k select ------------------------------
        p = params[f"p{level}"]
        score_local = jnp.tanh(
            (h @ p) / jnp.maximum(jnp.linalg.norm(p), 1e-12))
        # padding rows must never be selected (a trained bias makes their
        # scores nonzero) — mask to -inf by global position
        pos = d * cur_rows + jnp.arange(cur_rows)
        score_local = jnp.where(pos < cur_valid, score_local, -jnp.inf)
        score = jax.lax.all_gather(score_local, axis, tiled=True)
        order = jnp.argsort(-score)          # identical on every device
        rank = jnp.argsort(order)            # node -> global rank
        kept_ids = order[:k_total]           # rank t -> node id

        # ---- repartition: device d owns supernodes [d·k_per, ...) --------
        h_full = jax.lax.all_gather(h, axis, tiled=True)
        my_ids = jax.lax.dynamic_slice_in_dim(kept_ids, d * k_per, k_per)
        gate = score[my_ids]
        # k_total (rounded to a device multiple) can exceed num_valid —
        # padding picks carry -inf scores whose gate would NaN the backward
        gate = jnp.where(jnp.isfinite(gate), gate, 0.0)
        xp_local = h_full[my_ids] * gate[:, None]            # [k_per, H]

        # ---- coarse connect: relabel this device's edges -----------------
        new_s, new_r = rank[s_glob], rank[r_glob]
        keep = (new_s < k_total) & (new_r < k_total) & (w_e != 0)
        w_e = jnp.where(keep, w_e, 0.0)
        s_glob = jnp.where(keep, new_s, 0)
        r_glob = jnp.where(keep, new_r, 0)

        # ---- coarse GCN: local partial scatter + psum ---------------------
        xp_full = jax.lax.all_gather(xp_local, axis, tiled=True)  # [K, H]
        msgs = (xp_full @ params[f"W{level + 2}"])[s_glob] * w_e[:, None]
        part = jax.ops.segment_sum(msgs, r_glob, num_segments=k_total)
        h_glob = jax.nn.relu(jax.lax.psum(part, axis)
                             + params[f"b{level + 2}"])       # [K, H] repl.
        h = jax.lax.dynamic_slice_in_dim(h_glob, d * k_per, k_per)
        cur_valid, cur_rows = k_total, k_per

    # ---- readout (single graph): sum over supernodes → logits -----------
    z = jnp.sum(h_glob, axis=0)
    logits = z @ params["Wh"] + params["bh"]
    return logits, h


def make_sharded_pooled_forward(mesh: Mesh, *, rows_per: int, n_pad: int,
                                num_valid: int | None = None,
                                ratio: float = 0.5, num_levels: int = 1,
                                axis: str = "gp"):
    """Build the jitted sharded GCN → (topk-pool → coarse GCN) × num_levels
    → readout forward.

    Inputs: ``x [n_pad, F]`` sharded by rows, edge partitions
    ``S/R/W [D, E_local]`` sharded by device, params replicated.
    Returns ``(logits [C], h_last sharded [K_last, H])`` plus the per-level
    supernode counts.
    """
    from jax import shard_map

    n_devices = mesh.devices.size
    if num_valid is None:
        num_valid = n_pad
    ks = level_ks(num_valid, ratio, num_levels, n_devices)

    def body(params, x_local, S_d, R_d, W_d):
        return _forward_local(
            params, x_local, S_d[0], R_d[0], W_d[0], rows_per=rows_per,
            num_valid=num_valid, ks=ks, axis=axis)

    smapped = shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(), P(axis)),
    )
    return jax.jit(smapped), ks


def reference_pooled_forward(params, x, senders, receivers, edge_weight,
                             num_nodes: int, ks, num_valid=None):
    """Single-device reference of the same multi-level forward (parity
    tests; ``ks`` = per-level supernode counts from
    :func:`make_sharded_pooled_forward`)."""
    n_pad = x.shape[0]
    if num_valid is None:
        num_valid = num_nodes
    loops = jnp.arange(num_nodes)
    s_all = jnp.concatenate([senders, loops])
    r_all = jnp.concatenate([receivers, loops])
    w = (jnp.ones(senders.shape[0]) if edge_weight is None else edge_weight)
    w_all = jnp.concatenate([w, jnp.ones(num_nodes)])
    deg = jax.ops.segment_sum(w_all, s_all, num_segments=num_nodes)
    dinv = jax.lax.rsqrt(jnp.clip(deg, 1e-12, None))
    w_all = w_all * dinv[s_all] * dinv[r_all]

    h = jax.ops.segment_sum((x @ params["W1"])[s_all] * w_all[:, None],
                            r_all, num_segments=n_pad)
    h = jax.nn.relu(h + params["b1"])
    s_cur, r_cur, w_cur = s_all, r_all, w_all
    cur_valid = num_valid
    h_glob = None
    for level, k in enumerate(ks):
        p = params[f"p{level}"]
        score = jnp.tanh((h @ p) / jnp.maximum(jnp.linalg.norm(p), 1e-12))
        score = jnp.where(jnp.arange(h.shape[0]) < cur_valid, score, -jnp.inf)
        order = jnp.argsort(-score)
        rank = jnp.argsort(order)
        kept = order[:k]
        gate = score[kept]
        gate = jnp.where(jnp.isfinite(gate), gate, 0.0)
        xp = h[kept] * gate[:, None]
        new_s, new_r = rank[s_cur], rank[r_cur]
        keep = (new_s < k) & (new_r < k) & (w_cur != 0)
        s_cur = jnp.where(keep, new_s, 0)
        r_cur = jnp.where(keep, new_r, 0)
        w_cur = jnp.where(keep, w_cur, 0.0)
        agg = jax.ops.segment_sum(
            (xp @ params[f"W{level + 2}"])[s_cur] * w_cur[:, None], r_cur,
            num_segments=k)
        h_glob = jax.nn.relu(agg + params[f"b{level + 2}"])
        h = h_glob
        cur_valid = k
    z = jnp.sum(h_glob, axis=0)
    return z @ params["Wh"] + params["bh"], h_glob
