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

# HQ_TPU_TESTS=1 runs on the real chip instead (the @pytest.mark.tpu
# hardware tier: `HQ_TPU_TESTS=1 pytest -m tpu`); everything else forces
# the 8-virtual-device CPU backend.
if os.environ.get("HQ_TPU_TESTS") != "1":
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "tpu: hardware-tier test; runs only on a real TPU "
        "(HQ_TPU_TESTS=1 pytest -m tpu), auto-skipped on CPU",
    )


def pytest_collection_modifyitems(config, items):
    if jax.default_backend() == "tpu":
        return
    skip = pytest.mark.skip(
        reason="TPU hardware tier (HQ_TPU_TESTS=1 pytest -m tpu on a chip)"
    )
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
