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

# persistent compilation cache: the suite is compile-dominated on CPU;
# warm runs drop from ~10 min to ~2 min
_cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      ".jax_cache")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
