"""Test configuration: force CPU backend with 8 virtual devices.

All tests run on the CPU backend so CI needs no TPU (SURVEY.md §4 implication).
Multi-device sharding tests use the 8 virtual CPU devices. The environment's
sitecustomize force-registers the 'axon' TPU platform and overrides
JAX_PLATFORMS, so we must override via jax.config *before* backends initialize.
"""
import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "--xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


def pytest_report_header(config):
    return f"jax backend: {jax.default_backend()}, devices: {len(jax.devices())}"
