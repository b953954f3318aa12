"""Test config: force CPU with 8 fake devices so multi-chip sharding logic
(pjit over a Mesh) is exercised without TPU hardware (SURVEY.md §4)."""

import os

# The runtime exports JAX_PLATFORMS=axon (the TPU tunnel) and its site hook
# re-asserts it at jax import, so setting the env var is NOT enough — we must
# also update jax.config after import.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
