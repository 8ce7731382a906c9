"""On-chip bench: full hybrid coupled step at high-res scale.

21,600 columns (120x180 proxy grid), bf16 flagship BiGRU emulator +
FV advection + state advance, one jitted lax.scan over N coupled steps.
Compares the per-field XLA advection path against the fused multi-tracer
pallas stencil (HostLoopConfig.use_pallas). Methodology as bench.py.
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

from climsim_tpu.models.rnn import RNNAutoreg
from climsim_tpu.models import BF16
from climsim_tpu.online import HybridLoop, HostLoopConfig

NLAT, NLON, NLEV = 120, 180, 60
NCOL = NLAT * NLON
N = 20


class FakeGrid:
    """High-res proxy: synthetic lat/lon for the 21,600-column grid."""

    def __init__(self):
        rng = np.random.default_rng(0)
        self.lat = np.repeat(np.linspace(-88, 88, NLAT), NLON) \
            + rng.uniform(-0.1, 0.1, NCOL)
        self.lon = np.tile(np.linspace(0, 358, NLON), NLAT)

    def mass_weights(self, ps):
        return jnp.ones((ps.shape[0], NLEV))

    def layer_thickness(self, ps):
        return jnp.full((ps.shape[0], NLEV), 1e3)


def build(use_pallas: bool, emulator_pallas: bool = False):
    model = RNNAutoreg(nx=6, nx_sfc=24, ny=6, ny_sfc=8, nneur=(192, 192),
                       nh_mem=16, add_pres=False, policy=BF16,
                       use_pallas=emulator_pallas)
    xm = jnp.ones((NCOL, NLEV, 6), jnp.float32) * 0.1
    xs = jnp.ones((NCOL, 24), jnp.float32) * 0.1
    mem0 = jnp.zeros((NCOL, NLEV, 16), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), xm, xs, mem0)

    xscale = jnp.asarray([250.0, 1e-3, 1e-5, 1e-5, 10.0, 10.0])
    yscale = jnp.asarray([1e-5, 1e-8, 1e-9, 1e-9, 1e-5, 1e-5])

    def emulator(x_main_raw, x_sfc_raw, mem):
        xn = (x_main_raw / xscale).astype(jnp.float32)
        out, out_sfc, mem = model.apply(params, xn, x_sfc_raw, mem)
        return out * yscale, out_sfc, mem

    cfg = HostLoopConfig(nlat=NLAT, nlon=NLON, scheme="fv",
                         use_pallas=use_pallas, fix_water=True)
    loop = HybridLoop(emulator, FakeGrid(), cfg)

    rng = np.random.default_rng(1)
    state = {
        "T": jnp.asarray(rng.uniform(220, 300, (NCOL, NLEV)), jnp.float32),
        "qv": jnp.asarray(np.abs(rng.normal(1e-3, 3e-4, (NCOL, NLEV))),
                          jnp.float32),
        "qc": jnp.asarray(np.abs(rng.normal(1e-5, 3e-6, (NCOL, NLEV))),
                          jnp.float32),
        "qi": jnp.asarray(np.abs(rng.normal(1e-5, 3e-6, (NCOL, NLEV))),
                          jnp.float32),
        "u": jnp.asarray(rng.normal(0, 10, (NCOL, NLEV)), jnp.float32),
        "v": jnp.asarray(rng.normal(0, 3, (NCOL, NLEV)), jnp.float32),
    }
    x_sfc = jnp.concatenate([jnp.full((NCOL, 1), 1e5),
                             jnp.ones((NCOL, 23))], axis=1)
    return loop, state, mem0, x_sfc


def measure(loop, state, mem, x_sfc):
    @jax.jit
    def run(state, mem):
        st, m, diags = loop.rollout(state, mem, x_sfc, N)
        return diags["mean_T"][-1]

    triv = jax.jit(lambda m: jnp.sum(m[0, 0]))
    float(triv(mem))
    float(run(state, mem))
    t0 = time.perf_counter()
    for _ in range(3):
        float(triv(mem))
    fetch = (time.perf_counter() - t0) / 3
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(state, mem))
        times.append(time.perf_counter() - t0)
    return max(min(times) - fetch, 1e-9) / N


def main():
    for stencil, emul in ((False, False), (True, False), (True, True)):
        try:
            t = measure(*build(stencil, emul))
            # SYPD = simulated years per wall-clock day
            sypd = (1200.0 / t) / (365.0 * 86400.0) * 86400.0
            print(f"stencil_pallas={stencil} emulator_pallas={emul}: "
                  f"{t*1e3:.2f} ms/coupled-step "
                  f"({NCOL/t/1e3:.0f}k cols/s, {sypd:.0f} SYPD high-res)",
                  flush=True)
        except Exception as e:
            print(f"stencil_pallas={stencil} emulator_pallas={emul} "
                  f"failed: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
