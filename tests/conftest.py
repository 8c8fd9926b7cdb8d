"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; SURVEY.md §4 mandates testing the
DP mesh and shardings on 8 virtual CPU devices.  The container's axon
sitecustomize force-selects the TPU backend via `jax.config`, so overriding the
env var is not enough — the config must be updated before backends initialize
(they init lazily on first device use)."""

import os
import sys

# Make `sstts` (and tests/ helper modules) importable regardless of the
# invocation directory — the package is not pip-installed in this image,
# so bare `pytest` from another cwd otherwise fails at collection
# (round-4 advisor finding).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _bounded_compiler_state():
    """Clear compiled-program caches after each test module.

    XLA's CPU backend has segfaulted natively (inside
    `backend_compile_and_load`, reproducibly, twice at the same test) late
    in full-suite runs — after ~120 tests of accumulated live executables —
    while every per-module run of the same tests passes.  Bounding the
    live compiler state per module keeps the process inside the envelope
    known to be stable.  Cost: cross-module recompiles, which are rare
    (the memoized builders key on config, and configs differ per module)."""
    yield
    from sstts import train as train_mod

    for builder in (
        train_mod._jitted_init,
        train_mod.make_train_step,
        train_mod.make_cached_train_step,
        train_mod.make_grouped_train_step,
        train_mod.make_eval_step,
    ):
        builder.cache_clear()
    train_mod._MEDIA_WAV_FNS.clear()
    jax.clear_caches()
