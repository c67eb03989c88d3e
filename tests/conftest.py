"""Test config: force CPU with 8 virtual devices so multi-chip sharding paths
are exercised without TPU hardware (the standard JAX substitute for a cluster,
see SURVEY.md §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("EOE_TPU_FAKE_DATA", "1")

import jax  # noqa: E402

# a sitecustomize may have pre-registered a TPU backend and overridden
# jax_platforms; force CPU after import as well
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# fast/slow lanes: the full suite exceeds a 10-minute single-core budget, so
# heavyweight end-to-end modules are auto-marked `slow`. Fast lane:
# `pytest -m 'not slow'` (< ~5 min on one core); slow lane: `pytest -m slow`.
SLOW_MODULES = {
    "test_main", "test_folder_datasets", "test_clip", "test_multihost",
    "test_model_parity", "test_parallel", "test_stem", "test_trainer",
    "test_runbook",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__ in SLOW_MODULES:
            item.add_marker(pytest.mark.slow)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
