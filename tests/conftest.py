"""Test configuration: force CPU with 8 virtual devices so sharding tests run
without TPU hardware (SURVEY §4: sharded-vs-unsharded parity is the TPU
analogue of the reference's batched-vs-unbatched oracle).

``TGP_TPU_GATE=1`` (set by scripts/tpu_gate.py) leaves the real TPU backend
active instead, for the on-chip ``-m tpu`` verification lane; tests marked
``tpu`` are skipped automatically on the cpu backend."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

_TPU_GATE = os.environ.get("TGP_TPU_GATE") == "1"

# The axon TPU plugin's sitecustomize forces jax_platforms="axon,cpu" at
# interpreter boot, so the env var alone is not enough — override the config
# after import to keep unit tests on the (8-virtual-device) CPU backend.
import jax  # noqa: E402

if not _TPU_GATE:
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    """Skip ``tpu``-marked tests unless a non-cpu backend is active (the
    reference's capability-gated skipping pattern, tests/conftest.py:64-99,
    applied to hardware instead of optional deps)."""
    on_accel = _TPU_GATE and jax.default_backend() != "cpu"
    skip = pytest.mark.skip(
        reason="needs real TPU (run via scripts/tpu_gate.py)")
    for item in items:
        if "tpu" in item.keywords and not on_accel:
            item.add_marker(skip)

from tests.utils_graphs import (  # noqa: E402
    erdos_renyi_graph,
    chain_graph,
    make_batch,
)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def small_batch():
    """Canonical 3-graph batch (sizes 7/5/9, F=6) with padding — the analogue
    of the reference's conftest fixtures (tests/conftest.py:1-196)."""
    return make_batch([7, 5, 9], num_features=6, seed=42, pad_nodes=32, pad_edges=128)


@pytest.fixture(scope="session")
def medium_batch():
    return make_batch([20, 33, 15, 28], num_features=8, seed=7)
