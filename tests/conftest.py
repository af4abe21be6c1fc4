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
    # Persistent XLA compilation cache: the suite is jit-compile-bound
    # (~830 distinct programs); warm runs cut wall time ~2.7× (measured on
    # tests/test_models.py: 45 s cold → 17 s warm).  Repo-local, gitignored.
    _cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".cache", "jax")
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


#: compile-heaviest tests (>8 s each, pytest --durations profile, round 3).
#: They stay in the FULL gate (CI coverage run + `pytest tests/`); marking
#: them `slow` gives a sub-5-minute developer lane: `pytest -m "not slow"`
#: (warm persistent-compilation-cache timing).  Names, not nodeids, so
#: parametrized variants are all covered.
_HEAVY_TESTS = {
    "test_hybrid_step_matches_reference",
    "test_remat_gradient_invariance",
    "test_classification_pan",
    "test_inference_serving",
    "test_dp_train_step_matches_single_device",
    "test_pre_coarsening",
    "test_classification_aggr_reduce",
    "test_classification_topk",
    "test_asap_contract",
    "test_bnpool_grad",
    "test_pool_lift_autoencoder",
    "test_node_class_lift",
    "test_asap_ratio_and_leconv_score",
    "test_learnable_aggrs",
    "test_end_to_end_two_level_training",
    "test_lcm_singleton_passthrough",
    "test_bnpool_contract",
    "test_dense_topk_classifier_trains",
    "test_bnpool_num_neg_samples_cap",
    "test_classification_dense",
    "test_bnpool_matches_oracle",
    "test_clustering",
    "test_maxcut_ratios_total_assignment",
    "test_bnpool_loss_terms_and_eta",
}


def pytest_collection_modifyitems(config, items):
    """Skip ``tpu``-marked tests unless a non-cpu backend is active (the
    reference's capability-gated skipping pattern, tests/conftest.py:64-99,
    applied to hardware instead of optional deps); auto-mark the known
    compile-heavy tests ``slow`` (see :data:`_HEAVY_TESTS`)."""
    on_accel = _TPU_GATE and jax.default_backend() != "cpu"
    skip = pytest.mark.skip(
        reason="needs real TPU (run via scripts/tpu_gate.py)")
    slow = pytest.mark.slow
    for item in items:
        if "tpu" in item.keywords and not on_accel:
            item.add_marker(skip)
        name = getattr(item, "originalname", None) or item.name
        if name in _HEAVY_TESTS and "slow" not in item.keywords:
            item.add_marker(slow)

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
