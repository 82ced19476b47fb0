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


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
