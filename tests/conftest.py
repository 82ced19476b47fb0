"""Test harness configuration.

All unit tests run on a virtual 8-device CPU mesh (the JAX analog of the
reference's `configs/trainer/ddp_sim.yaml` CPU-DDP simulation backend; see
SURVEY.md §4).

The container's sitecustomize imports jax at interpreter startup and pins
JAX_PLATFORMS=axon (one real TPU chip behind a tunnel), so env vars set here
are too late — we must go through jax.config before the backend initializes.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

# The fast tier (`make test-fast`, `-m fast`): host-side / light-compile
# suites that finish in <5 min even when the XLA persistent cache is cold
# (the full suite takes ~2 h in that mode — ROUND_NOTES).  Heavy-compile
# suites (models, pipeline, parity, training) stay full-suite-only.
FAST_MODULES = {
    "test_apps",
    "test_cleaners_golden",
    "test_data",
    "test_doctests",
    "test_entrypoints",
    "test_export_torch",
    "test_game_ui",
    "test_io",
    "test_mas",
    "test_mas_cpp",
    "test_numbers",
    "test_text",
    "test_utils",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__ in FAST_MODULES:
            item.add_marker(pytest.mark.fast)


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
