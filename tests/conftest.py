"""Test env: CPU backend with 8 virtual devices so multi-chip sharding tests
run without TPU hardware (mirrors the driver's dryrun_multichip harness)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
