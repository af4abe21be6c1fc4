"""Utilities (reference: tgp/utils/)."""
from tgp_tpu.utils.activations import resolve_activation

__all__ = ["resolve_activation"]
