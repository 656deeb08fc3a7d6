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

jax.config.update("jax_platform_name", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
