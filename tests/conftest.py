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

# Per-MACHINE persistent compilation cache for the CPU test profile: most of
# the suite's wall time is XLA CPU compiles repeated on every run. The
# product cache (.jax_cache, committed) is TPU-only because CPU AOT
# artifacts are machine-specific and can SIGILL elsewhere — so tests cache
# under the user cache dir, never the repo.
_cpu_cache = os.environ.get("STITCH_TEST_JAX_CACHE") or os.path.join(
    os.path.expanduser("~"), ".cache", "stitchingvideo_tpu_test_xla")
if _cpu_cache != "0":
    os.makedirs(_cpu_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cpu_cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


def pytest_report_header(config):
    return f"jax backend: {jax.default_backend()}, devices: {len(jax.devices())}"
