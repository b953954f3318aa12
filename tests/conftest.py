"""Test config: force CPU with 8 fake devices so multi-chip sharding logic
(pjit over a Mesh) is exercised without TPU hardware (SURVEY.md §4)."""

import os

# The runtime exports JAX_PLATFORMS=axon (the TPU tunnel) — override it.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
