"""Test configuration: run everything on a virtual 8-device CPU mesh so
sharding/collective code paths are exercised without TPU hardware
(SURVEY.md §4 'multi-host BA testable on CPU via
--xla_force_host_platform_device_count').

Note: the environment's sitecustomize imports jax at interpreter startup
with JAX_PLATFORMS=axon, so env vars alone are too late here — we must use
jax.config.update. XLA_FLAGS still works because the CPU backend is
initialized lazily, after this conftest runs.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
