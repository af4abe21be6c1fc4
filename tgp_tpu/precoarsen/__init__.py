"""Precomputed-coarsening (precoarsening) subsystem.

The reference runs non-trainable, feature-independent selectors offline in a
PyG ``pre_transform`` (tgp/data/transforms.py:184-448 + tgp/src.py:560-692):
NDP's spectral partition + Kron reduction, Graclus matching, SEP coding
trees, NMF and EigenPool spectral clustering all execute on the **host**
(scipy/sklearn), and only reduce/MP run in the training hot path.

This package mirrors that split for TPU: per-graph NumPy level functions
produce serializable artifacts (``LevelArtifact`` dicts), the
:class:`PreCoarsening` transform rolls them out multi-level, and
:mod:`tgp_tpu.data.pooled_loader` collates them into device-ready
static-shape ``SelectOutput`` + pooled ``GraphBatch`` pairs.
"""

from tgp_tpu.precoarsen.api import (
    PRECOARSENERS,
    PreCoarsening,
    precoarsen_graph,
    register_precoarsener,
)

__all__ = [
    "PRECOARSENERS",
    "PreCoarsening",
    "precoarsen_graph",
    "register_precoarsener",
]
