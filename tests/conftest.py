"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; SURVEY.md §4 mandates testing the
DP mesh and shardings on 8 virtual CPU devices.  The container's axon
sitecustomize force-selects the TPU backend via `jax.config`, so overriding the
env var is not enough — the config must be updated before backends initialize
(they init lazily on first device use)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
