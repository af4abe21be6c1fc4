"""String → activation resolver (reference: torch_geometric
``activation_resolver`` used by tgp/select/topk_select.py:36-40)."""

from __future__ import annotations

from typing import Callable, Optional, Union

import jax
import jax.numpy as jnp

_ACTS = {
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
    "relu": jax.nn.relu,
    "elu": jax.nn.elu,
    "gelu": jax.nn.gelu,
    "softplus": jax.nn.softplus,
    "leaky_relu": jax.nn.leaky_relu,
    "identity": lambda x: x,
    "linear": lambda x: x,
    "none": lambda x: x,
}


def resolve_activation(act: Union[str, Callable, None]) -> Callable:
    if act is None:
        return lambda x: x
    if callable(act):
        return act
    try:
        return _ACTS[act.lower()]
    except KeyError:
        raise ValueError(f"unknown activation {act!r}") from None
