"""Test harness: run on CPU with 8 virtual devices so sharding/collective
paths are exercised without TPU hardware (SURVEY.md §4 implication).

NOTE: this environment pre-imports jax at interpreter startup (sitecustomize
registers the single-chip TPU tunnel), so JAX_PLATFORMS/JAX_ENABLE_X64 env
vars are already consumed; we must go through jax.config.update before any
backend is initialized. XLA_FLAGS is still read lazily at backend init.
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
