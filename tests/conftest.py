"""Test harness: force the CPU backend with 8 virtual devices so sharding
logic is exercised without TPU hardware (SURVEY.md §4).

The image's sitecustomize registers the tunneled TPU backend at
interpreter start and overrides ``JAX_PLATFORMS``, so env vars alone don't
stick — the platform must be re-pinned via ``jax.config`` before any
computation runs.  A shared TPU chip would make unit tests flaky and slow;
everything here is designed to pass on CPU.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
