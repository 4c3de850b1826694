"""Test configuration: force CPU with 8 virtual devices so sharding tests
run anywhere (mirrors how the driver dry-runs the multi-chip path).

Note: this environment's sitecustomize force-registers a TPU ("axon")
platform via jax.config, which overrides JAX_PLATFORMS env — so the
platform must be reset through jax.config *after* importing jax.
Set ISPLIB_TEST_TPU=1 to run the suite on the real chip instead.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

if not os.environ.get("ISPLIB_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")
else:
    # On-chip runs compile through a slow tunnel — persist executables so
    # repeat runs (and the TPU_TESTS.md evidence run) skip recompiles.
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.expanduser("~"), ".cache", "isplib_tpu",
                     "jaxcache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

# Dense test oracles (a @ x) must be exact fp32: the default matmul
# precision is bf16-grade passes, which breaks allclose comparisons.
jax.config.update("jax_default_matmul_precision", "highest")


def pytest_report_header(config):
    return f"jax devices: {jax.devices()}"


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
