"""Test env: CPU backend with 8 virtual devices so multi-chip sharding tests
run without TPU hardware (mirrors the driver's dryrun_multichip harness).

NOTE: the axon TPU plugin in this image overrides the JAX_PLATFORMS env var,
so we must force the platform through jax.config after import."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
# Low-core machines: virtual devices reach collectives far apart in time;
# the default 40 s rendezvous termination check would crash the process.
if "collective_call_terminate_timeout" not in flags:
    flags += (" --xla_cpu_collective_call_terminate_timeout_seconds=1200"
              " --xla_cpu_collective_call_warn_stuck_timeout_seconds=600")
os.environ["XLA_FLAGS"] = flags.strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compile cache: repeat suite runs skip XLA compilation
from rmem_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache("/tmp/rmem_tpu_jax_cache_cpu")
