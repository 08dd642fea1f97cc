"""Test environment: force the CPU backend with 8 virtual devices so the
sharding logic is exercised without TPU hardware (SURVEY.md section 4,
multi-host-without-a-cluster).

Note: this container's axon TPU plugin registers itself via sitecustomize
and overrides the JAX_PLATFORMS env var, so the CPU backend must be forced
via jax.config *after* import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
