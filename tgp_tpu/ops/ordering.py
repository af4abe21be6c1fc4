"""Locality-preserving node orderings (host-side, precompute once per
graph layout).

The sparse pipeline's remaining cost after the round-3 kernel rewrite is
the ``x[senders]`` gather leg, which runs at the random-256B-row HBM
ceiling (~273 GB/s measured, RESULTS.md).  Beating it requires LOCALITY,
not a better segment-sum: a bandwidth-reducing node order packs each
receiver block's senders into a VMEM-resident window so the fused banded
kernel (:func:`tgp_tpu.ops.pallas.segment_spmm.spmm_banded`) can replace
both the gather and the ``[E, F]`` message materialization with one-hot
matmuls on the MXU.

The reference has no analogue (torch gathers are latency-hidden by the
GPU's HBM parallelism; TPUs reward streaming instead).  Reverse
Cuthill–McKee is the classic bandwidth-reducing order; scipy provides it
on CSR.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

__all__ = ["rcm_order", "apply_node_order", "band_after_order",
           "choose_banded_window", "plan_locality_spmm", "locality_spmm"]


def rcm_order(edge_index, num_nodes: int) -> np.ndarray:
    """Reverse Cuthill–McKee permutation: ``perm[new] = old`` node id.
    Symmetrizes the pattern first (RCM is defined on undirected graphs)."""
    import scipy.sparse as sp
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    ei = np.asarray(edge_index)
    data = np.ones(ei.shape[1], np.int8)
    A = sp.coo_matrix((data, (ei[0], ei[1])),
                      shape=(num_nodes, num_nodes)).tocsr()
    A = A.maximum(A.T)
    return np.asarray(reverse_cuthill_mckee(A, symmetric_mode=True),
                      dtype=np.int64)


def apply_node_order(perm: np.ndarray, x, edge_index,
                     edge_weight=None) -> Tuple:
    """Relabel a graph by ``perm`` (``perm[new] = old``): returns
    ``(x[perm], inv[edge_index][, edge_weight])`` plus ``inv`` so callers
    can map results back (``out_original = out_new[inv]``)."""
    perm = np.asarray(perm, np.int64)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.size)
    ei = inv[np.asarray(edge_index)]
    x2 = np.asarray(x)[perm]
    if edge_weight is None:
        return x2, ei, inv
    return x2, ei, np.asarray(edge_weight), inv


def band_after_order(edge_index, num_nodes: int,
                     perm: Optional[np.ndarray] = None) -> int:
    """Max |sender − receiver| under ``perm`` (None = current order) —
    the half-bandwidth that sizes the banded kernel's window."""
    ei = np.asarray(edge_index)
    if perm is not None:
        inv = np.empty(num_nodes, np.int64)
        inv[np.asarray(perm)] = np.arange(num_nodes)
        ei = inv[ei]
    if ei.shape[1] == 0:
        return 0
    return int(np.abs(ei[0] - ei[1]).max())


def choose_banded_window(bandwidth: int, block_rows: int = 128,
                         max_window: int = 4096) -> Optional[int]:
    """Smallest 128-multiple window covering a receiver block's sender span
    (``bandwidth·2 + block_rows`` worst case), or None when it exceeds
    ``max_window`` (VMEM budget) and the banded kernel should not be used."""
    need = 2 * bandwidth + block_rows + 8
    w = ((need + 127) // 128) * 128
    return w if w <= max_window else None


def plan_locality_spmm(edge_index, num_nodes: int, edge_weight=None, *,
                       block_rows: int = 128, max_window: int = 4096,
                       engine: str = "auto"):
    """Host-side plan: RCM-order the graph and pick the SpMM engine.

    Returns a dict with the relabeled static layout (receiver-sorted),
    the RCM ``bandwidth``/``window``, and ``engine ∈ {"banded", "sorted"}``.

    ``engine="auto"`` currently always resolves to ``"sorted"`` (gather +
    grouped sorted-CSR): the round-3 on-chip sweep (scripts/exp_r3_banded.py,
    v5e, E=1M, F=128, bf16) measured the fused banded kernel LOSING to
    gather+grouped at every window — 11.9 ms at window 640 / 12.8 at 1152 /
    14.8 at 2304 vs 4.57 ms — the in-kernel one-hot gather costs
    ``E·window·F`` MACs plus a ``window×BE`` VPU mask per chunk, which
    exceeds what the random-row gather saves.  RCM ordering still helps the
    sorted engine (spatially-close senders → better gather locality) and
    the banded engine stays available as ``engine="banded"`` for very
    narrow bands or future hardware where the tradeoff flips.

    All outputs are static per graph layout — compute once in the loader,
    reuse every step.  ``out[inv]`` maps results back to the input order.
    """
    import jax.numpy as jnp

    perm = rcm_order(edge_index, num_nodes)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.size)
    ei = inv[np.asarray(edge_index)]
    w = (np.ones(ei.shape[1], np.float32) if edge_weight is None
         else np.asarray(edge_weight, np.float32))
    bw = band_after_order(np.stack([ei[0], ei[1]]), num_nodes)
    # the banded execution path (spmm_banded → banded_sorted_spmm_pallas)
    # always runs 128-row blocks, so the window MUST be sized for 128 —
    # sizing it for a smaller block_rows under-covers the block's span and
    # the kernel silently drops out-of-window senders
    window = choose_banded_window(bw, max(block_rows, 128), max_window)

    order = np.argsort(ei[1], kind="stable")
    s_s, r_s, w_s = ei[0][order], ei[1][order], w[order]
    counts = np.bincount(r_s, minlength=num_nodes)
    row_ptr = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    if engine == "auto":
        chosen = "sorted"  # measured-best on v5e (see docstring)
    elif engine == "banded":
        if window is None:
            raise ValueError(
                f"bandwidth {bw} exceeds max_window={max_window}; "
                "banded engine not applicable")
        chosen = "banded"
    elif engine == "sorted":
        chosen = "sorted"
    else:
        raise ValueError(f"unknown engine {engine!r}")
    return {
        "engine": chosen,
        "window": window,
        "bandwidth": bw,
        "perm": perm,
        "inv": inv,
        "senders": jnp.asarray(s_s.astype(np.int32)),
        "receivers": jnp.asarray(r_s.astype(np.int32)),
        "edge_weight": jnp.asarray(w_s),
        "row_ptr": jnp.asarray(row_ptr),
    }


def locality_spmm(plan: dict, x_new_order, *, interpret: bool = False):
    """Execute a :func:`plan_locality_spmm` plan on features ALREADY in the
    plan's node order (``x[plan["perm"]]``).  Returns ``A·X`` in plan
    order; map back with ``out[plan["inv"]]``."""
    if plan["engine"] == "banded":
        from tgp_tpu.ops.pallas.segment_spmm import spmm_banded

        return spmm_banded(x_new_order, plan["senders"], plan["receivers"],
                           plan["edge_weight"],
                           plan["row_ptr"].shape[0] - 1,
                           window=plan["window"], interpret=interpret)
    from tgp_tpu.ops.pallas.segment_spmm import segment_sum_sorted

    # segment_sum_sorted pads the row count to the kernel's block grid
    # internally and slices back, so arbitrary node counts (not a multiple
    # of 128) are safe here (ADVICE r3: raw num_rows tripped the
    # block-alignment assert in spmm_sorted).
    num_rows = plan["row_ptr"].shape[0] - 1
    msgs = x_new_order[plan["senders"]] * plan["edge_weight"][:, None]
    return segment_sum_sorted(msgs, plan["receivers"], num_rows,
                              interpret=interpret)
