"""Multi-host (DCN × ICI) hybrid mesh layer.

The reference has no distributed runtime at all (SURVEY §2.12) — this is
new TPU-first design for pod-scale training:

* **ICI axis** (fast, intra-slice): edge-partitioned model parallelism —
  the sharded pooled forward of :mod:`tgp_tpu.parallel.pooled_model`, whose
  collectives (``all_gather`` of node rows, ``psum`` of coarse partial
  scatters) ride the intra-slice interconnect.
* **DCN axis** (slow, inter-slice): data parallelism — each DCN group
  trains on a different graph; the only cross-DCN traffic is one
  gradient all-reduce per step (params-sized, latency-tolerant), the
  standard DP-over-DCN recipe.

On a real pod, call :func:`initialize_multihost` first (thin wrapper over
``jax.distributed.initialize``) and build the mesh with
:func:`make_hybrid_mesh`, which uses ``mesh_utils.create_hybrid_device_mesh``
so the inner axis maps to ICI neighbours.  On a single host (or the virtual
CPU mesh) the same code paths run with a reshaped device grid — that is how
``tests/parallel/test_multihost.py`` and ``__graft_entry__.dryrun_multichip``
validate the sharding compiles and matches the single-device reference.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tgp_tpu.parallel.pooled_model import _forward_local

__all__ = ["initialize_multihost", "make_hybrid_mesh",
           "make_hybrid_pooled_train_step", "stack_group_graphs"]


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> bool:
    """Initialize ``jax.distributed`` for multi-process (multi-host) runs.

    All arguments default to autodetection from the standard environment
    (TPU pod metadata / ``JAX_COORDINATOR_ADDRESS`` etc.).  Returns True if
    distributed mode was initialized, False for single-process runs (no-op,
    so library code can call this unconditionally).
    """
    # NB: do NOT touch jax.process_count() before initialize — it boots the
    # XLA backend, after which distributed.initialize always raises and a
    # fresh pod would silently run single-host forever
    if jax.distributed.is_initialized():
        return jax.process_count() > 1
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except Exception:
        if coordinator_address is not None:
            raise  # explicit configuration must fail loudly
        return False  # single-process / nothing to autodetect
    return jax.process_count() > 1


def make_hybrid_mesh(n_groups: int, per_group: int,
                     axes: Sequence[str] = ("dcn", "ici"),
                     devices=None) -> Mesh:
    """``[n_groups, per_group]`` device mesh with the inner axis on ICI.

    On a real multi-slice/multi-host topology this delegates to
    ``mesh_utils.create_hybrid_device_mesh`` (which places the outer axis
    across DCN); on a single host it reshapes the device list (every axis is
    then "ICI", which is conservative).
    """
    devs = list(devices or jax.devices())
    if len(devs) < n_groups * per_group:
        raise ValueError(
            f"need {n_groups * per_group} devices, have {len(devs)}")
    if jax.process_count() > 1:
        from jax.experimental import mesh_utils

        # slice to the requested sub-topology like the single-host branch:
        # create_hybrid_device_mesh requires len(devices) == product of the
        # mesh shapes, so passing the full device list breaks any request
        # smaller than the whole pod
        arr = np.asarray(mesh_utils.create_hybrid_device_mesh(
            (per_group,), (n_groups,),
            devices=devs[: n_groups * per_group])).reshape(
                n_groups, per_group)
    else:
        arr = np.asarray(devs[: n_groups * per_group]).reshape(
            n_groups, per_group)
    return Mesh(arr, tuple(axes))


def stack_group_graphs(prepped: Sequence[tuple]):
    """Stack per-group ``prepare_sharded_graph`` outputs
    ``(S, R, W, n_pad, rows_per)`` on a leading DCN axis, padding the edge
    budgets to a common maximum.  All groups must share ``n_pad``."""
    n_pads = {p[3] for p in prepped}
    rows = {p[4] for p in prepped}
    if len(n_pads) != 1 or len(rows) != 1:
        raise ValueError(f"groups disagree on padding: {n_pads}, {rows}")
    e_max = max(p[0].shape[1] for p in prepped)

    def pad_e(a, fill=0):
        pad = e_max - a.shape[1]
        if pad:
            a = jnp.pad(a, ((0, 0), (0, pad)))
        return a

    S = jnp.stack([pad_e(p[0]) for p in prepped])
    R = jnp.stack([pad_e(p[1]) for p in prepped])
    W = jnp.stack([pad_e(p[2]) for p in prepped])
    return S, R, W, next(iter(n_pads)), next(iter(rows))


def make_hybrid_pooled_train_step(mesh: Mesh, tx, *, rows_per: int,
                                  n_pad: int, num_valid: int,
                                  ratio: float = 0.5, num_levels: int = 1,
                                  dcn_axis: str = "dcn",
                                  ici_axis: str = "ici"):
    """Jitted hybrid train step: DP over ``dcn_axis`` (one graph per group),
    edge-partitioned pooled model over ``ici_axis`` within each group.

    Inputs: ``params``/``opt_state`` replicated; ``X [G, n_pad, F]`` sharded
    ``P(dcn, ici)`` (group-major rows split over ICI); ``S/R/W
    [G, D_ici, E_local]`` sharded ``P(dcn, ici)``; labels ``y [G]`` sharded
    ``P(dcn)``.  Returns ``(params, opt_state, loss)`` with the loss averaged
    over groups.  Cross-DCN traffic: ONE gradient all-reduce (inserted by
    the autodiff transpose of the pmean'd loss).
    """
    from jax import shard_map

    from tgp_tpu.parallel.pooled_model import level_ks

    n_ici = mesh.shape[ici_axis]
    ks = level_ks(num_valid, ratio, num_levels, n_ici)

    def per_device(params, opt_state, x, S, R, W, y):
        # leading group axis (size 1 per device) and ici edge-partition axis
        x_local, s_d, r_d, w_d, y_g = x[0], S[0, 0], R[0, 0], W[0, 0], y[0]

        def mean_loss(p):
            logits, _ = _forward_local(
                p, x_local, s_d, r_d, w_d, rows_per=rows_per,
                num_valid=num_valid, ks=ks, axis=ici_axis)
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits[None], y_g[None]).mean()
            # ce is already ICI-invariant (the forward's psums reduce over
            # ici); pmean over DCN gives the group-mean objective, and the
            # autodiff transpose of the forward collectives inserts the
            # intra-group gradient reductions automatically
            return jax.lax.pmean(ce, dcn_axis)

        loss, grads = jax.value_and_grad(mean_loss)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    smapped = shard_map(
        per_device, mesh=mesh,
        in_specs=(P(), P(), P(dcn_axis, ici_axis), P(dcn_axis, ici_axis),
                  P(dcn_axis, ici_axis), P(dcn_axis, ici_axis), P(dcn_axis)),
        out_specs=(P(), P(), P()),
    )
    return jax.jit(smapped), ks


def device_put_hybrid(mesh: Mesh, X, S, R, W, y, dcn_axis="dcn",
                      ici_axis="ici"):
    """Place the stacked group arrays with the hybrid shardings."""
    sh2 = NamedSharding(mesh, P(dcn_axis, ici_axis))
    sh1 = NamedSharding(mesh, P(dcn_axis))
    return (jax.device_put(X, sh2), jax.device_put(S, sh2),
            jax.device_put(R, sh2), jax.device_put(W, sh2),
            jax.device_put(y, sh1))
