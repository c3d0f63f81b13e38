"""Test env: force the CPU backend with 8 virtual devices so multi-chip
sharding (shard_map/pjit over a Mesh) is exercised without TPU hardware.

Note: this image pre-registers a TPU backend via sitecustomize and pins
JAX_PLATFORMS=axon, so plain env vars are not enough — we must override the
jax config after import (before first backend use) and set XLA_FLAGS for the
virtual CPU device count."""

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


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu_devices():
    assert jax.devices()[0].platform == "cpu"
    assert len(jax.devices()) == 8
