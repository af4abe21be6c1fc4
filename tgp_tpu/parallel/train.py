"""Data-parallel training over a device mesh (pjit/shard_map).

The reference has **no** distributed runtime (SURVEY §2.12) — this subsystem
is new design: graphs are batched per device (same static shapes everywhere),
the batch pytree is stacked on a leading ``dp`` axis and sharded over the
mesh, gradients are all-reduced with ``psum`` over ICI, and parameters stay
replicated.  Edge-partitioned single-graph sharding lives in
:mod:`tgp_tpu.parallel.spmm` (halo exchange).
"""

from __future__ import annotations


from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["make_mesh", "stack_batches", "make_dp_train_step"]


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if n > len(devs):
        # fail loudly: silently truncating produces a size-1 mesh whose
        # shard_map runs the per-device body on the WHOLE input with wrong
        # partition metadata (e.g. host-side partition_edges computed for n
        # devices) — numerically wrong, not just slow
        raise ValueError(
            f"make_mesh({n}) but only {len(devs)} JAX device(s) visible "
            f"({jax.default_backend()}); set "
            f"XLA_FLAGS=--xla_force_host_platform_device_count={n} and "
            f"force the cpu platform for virtual-device runs")
    return Mesh(np.asarray(devs[:n]), (axis,))


def stack_batches(batches: Sequence[Any]):
    """Stack per-device pytrees (e.g. :class:`GraphBatch`) on a new leading
    ``dp`` axis.  All batches must share static metadata."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *batches)


def make_dp_train_step(loss_fn: Callable, tx, mesh: Mesh, axis: str = "dp"):
    """Build a jitted data-parallel train step.

    ``loss_fn(params, batch, y) -> scalar`` is the per-device loss;
    the returned step takes ``(params, opt_state, stacked_batch, stacked_y)``
    with the batch sharded over ``axis`` and params/opt_state replicated,
    computes per-device grads, ``psum``-averages them over ICI, and applies
    the update identically on every device.
    """
    from jax import shard_map

    def per_device(params, opt_state, batch, y):
        # leading dp axis of size 1 on each device — drop it
        batch = jax.tree_util.tree_map(lambda a: a[0], batch)
        y = y[0]

        # Differentiate the pmean'd loss: under shard_map's varying-axes
        # semantics, grad wrt replicated params of a mean-over-devices loss
        # IS the device-mean gradient (the transpose inserts the psum) —
        # no explicit gradient collective needed.
        def mean_loss(p):
            return jax.lax.pmean(loss_fn(p, batch, y), axis)

        loss, grads = jax.value_and_grad(mean_loss)(params)
        # pass params so weight-decay optimizers (adamw etc.) work too
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    smapped = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis)),
        out_specs=(P(), P(), P()),
    )
    return jax.jit(smapped)
