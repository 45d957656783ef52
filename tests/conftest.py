"""Test configuration: force an 8-device virtual CPU mesh so sharding tests
run without TPU hardware, and keep compilation deterministic."""
import os

# Must be set before jax is imported anywhere. Force CPU even if the
# session environment points at a TPU — unit tests validate logic, and the
# 8-device virtual CPU platform is what the sharding tests need.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The environment's TPU plugin ("axon") can override JAX_PLATFORMS during
# plugin discovery; pin the platform explicitly as well.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
