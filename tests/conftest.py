"""Test config: run JAX on 8 virtual CPU devices so mesh/sharding tests and
all correctness tests run without TPU hardware (SURVEY.md section 4).

Note: this environment's sitecustomize registers the axon TPU backend at
interpreter start and forces jax_platforms to it, so plain JAX_PLATFORMS=cpu
in the environment is not enough — we override the config after importing
jax, before any backend is initialized. The TPU is single-client here; tests
must never touch it (the bench harness owns it).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
