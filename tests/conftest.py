"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip hardware is not available in CI; all sharding/parallelism tests
run against ``xla_force_host_platform_device_count=8`` on CPU, the standard
JAX analogue of a fake multi-node backend (SURVEY.md §4). The environment
pins ``JAX_PLATFORMS=axon`` (a tunneled TPU); we override BOTH the env var
and, because the axon plugin registers itself regardless, the platform name
after import. Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon plugin's register() (sitecustomize) runs BEFORE this file and
# does jax.config.update("jax_platforms", "axon,cpu"), overriding the env
# var above and making the tunneled backend REQUIRED: if the tunnel is
# down, every backends() call raises/hangs even in CPU-forced runs.
# Overriding the config value back to "cpu" makes the suite fully
# tunnel-independent.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_platform_name", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running test (full-model parity and the like)")
