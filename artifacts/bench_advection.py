"""On-chip microbench: fused pallas multi-tracer FV advection vs XLA.

High-res-scale fields: 6 tracers x 60 levels x [120, 180] proxy grid
(21,600 columns). Methodology as bench.py (on-device lax.scan, scalar
fetch, trivial-fetch subtraction).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

cache = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from climsim_tpu.ops.pallas_stencil import (_fv_advect_tracers_fwd_impl,
                                            _fv_reference)

NTRAC, NLEV, NLAT, NLON = 6, 60, 120, 180
N = 50


def measure(fn, qs, u, v):
    @jax.jit
    def loop(qs, u, v):
        def body(q, _):
            out = fn(q, u, v)
            return out, ()
        q, _ = jax.lax.scan(body, qs, None, length=N)
        return jnp.sum(q[0, 0, 0])

    triv = jax.jit(lambda q: jnp.sum(q[0, 0, 0]))
    float(triv(qs))
    float(loop(qs, u, v))
    t0 = time.perf_counter()
    for _ in range(3):
        float(triv(qs))
    fetch = (time.perf_counter() - t0) / 3
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(loop(qs, u, v))
        times.append(time.perf_counter() - t0)
    dt = max(min(times) - fetch, 1e-9)
    return dt / N


def main():
    rng = np.random.default_rng(0)
    qs = jnp.asarray(np.abs(rng.normal(1, 0.3, (NTRAC, NLEV, NLAT, NLON))),
                     jnp.float32)
    u = jnp.asarray(rng.normal(0, 0.3, (NLEV, NLAT, NLON)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 0.3, (NLEV, NLAT, NLON)), jnp.float32)

    xla = lambda q, uu, vv: _fv_reference(q, uu, vv, 0.4, 0.4)
    pallas = lambda q, uu, vv: _fv_advect_tracers_fwd_impl(
        q, uu, vv, 0.4, 0.4, False)

    bytes_min = (qs.size + 2 * u.size + qs.size) * 4  # loads + stores
    for name, fn in (("xla", xla), ("pallas", pallas)):
        try:
            t = measure(fn, qs, u, v)
            gbps = bytes_min / t / 1e9
            print(f"{name}: {t*1e3:.3f} ms/step  ({gbps:.0f} GB/s "
                  f"min-traffic)", flush=True)
        except Exception as e:
            print(f"{name} failed: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()

# A level-blocked variant (2-10 levels per program) was tried and OOM'd
# Mosaic's scoped VMEM through the remote-compile tunnel (the compiler
# staged the full [6,60,120,180] output in VMEM); single-level blocks are
# the shipped configuration.
