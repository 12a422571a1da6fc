"""Test environment: 8 virtual CPU devices so mesh/sharding tests run in CI
without TPU hardware (SURVEY.md §4 "distributed without a cluster")."""
import os

# Must be set before jax is imported anywhere in the test process. Force cpu:
# the ambient environment may pin JAX_PLATFORMS to a remote TPU plugin, which
# would route every tiny test compile over the device tunnel.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The ambient TPU plugin overrides JAX_PLATFORMS at import time; the config
# update below is what actually pins the tests to (virtual 8-device) CPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compilation cache: this box has 2 cores and XLA:CPU compiles are
# the dominant test cost; repeat runs hit the cache.
_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_ROOT = "/root/reference"


@pytest.fixture(scope="session")
def reference_path():
    """Puts the read-only reference repo on sys.path for golden-value tests."""
    import sys

    if not os.path.isdir(REFERENCE_ROOT):
        pytest.skip("reference repo not available")
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    return REFERENCE_ROOT


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
