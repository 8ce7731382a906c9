"""Per-stage decomposition of the 21,600-column hybrid coupled step.

SUPERSEDED by profile_hybrid_r5.py (the v6-arm round-5 decomposition);
kept for the round-3 record. The scoped-VMEM jit options it used are no
longer needed (the round-4 Mosaic vmem_limit declaration), so _vmem_jkw
is a no-op shim here.

Round-3 answer to the round-2 bench regression (VERDICT.md weak #1/#2):
times the FULL step across {geometry} x {stencil} x {emulator} configs plus
isolated emulator-only / advection-only / no-advection stages, all with the
bench.py on-device-scan methodology (block_until_ready does not sync through
the tunnel). Writes artifacts/profile_hybrid_r3.json.

Run serialized with any other TPU work:  timeout 5400 python artifacts/profile_hybrid.py
"""
import json
import os
import statistics
from functools import partial
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _enable_compile_cache  # noqa: E402


def _vmem_jkw():
    """No-op shim: the scoped-VMEM compiler option this returned in round
    3 is unnecessary since the round-4 per-call Mosaic vmem_limit_bytes
    declaration (and actively harmful program-wide)."""
    return {}


_enable_compile_cache()

N_STEPS = 20
REPEATS = 5
HI = (120, 180, 60)


def build(geometry, stencil_pallas, emulator_pallas, scheme="fv",
          fix_water=True, fix_energy=False):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from climsim_tpu.models.rnn import RNNAutoreg
    from climsim_tpu.models import BF16
    from climsim_tpu.online import HybridLoop, HostLoopConfig

    nlat, nlon, nlev = HI
    ncol = nlat * nlon
    model = RNNAutoreg(nx=6, nx_sfc=24, ny=6, ny_sfc=8, nneur=(192, 192),
                       nh_mem=16, add_pres=False, policy=BF16,
                       use_pallas=emulator_pallas)
    xm = jnp.ones((ncol, nlev, 6), jnp.float32) * 0.1
    xs = jnp.ones((ncol, 24), jnp.float32) * 0.1
    mem0 = jnp.zeros((ncol, nlev, 16), jnp.float32)
    params = jax.jit(model.init, **_vmem_jkw())(jax.random.PRNGKey(0),
                                                xm, xs, mem0)

    xscale = jnp.asarray([250.0, 1e-3, 1e-5, 1e-5, 10.0, 10.0])
    yscale = jnp.asarray([1e-5, 1e-8, 1e-9, 1e-9, 1e-5, 1e-5])

    def emulator(x_main_raw, x_sfc_raw, mem):
        xn = (x_main_raw / xscale).astype(jnp.float32)
        out, out_sfc, mem = model.apply(params, xn, x_sfc_raw, mem)
        return out * yscale, out_sfc, mem

    class ProxyGrid:
        def __init__(self):
            rng = np.random.default_rng(0)
            self.lat = np.repeat(np.linspace(-88, 88, nlat), nlon) \
                + rng.uniform(-0.1, 0.1, ncol)
            self.lon = np.tile(np.linspace(0, 360 - 360 / nlon, nlon), nlat)

        def mass_weights(self, ps):
            return jnp.ones((ps.shape[0], nlev))

        def layer_thickness(self, ps):
            return jnp.full((ps.shape[0], nlev), 1e3)

    cfg = HostLoopConfig(nlat=nlat, nlon=nlon, scheme=scheme,
                         geometry=geometry, use_pallas=stencil_pallas,
                         fix_water=fix_water, fix_energy=fix_energy)
    loop = HybridLoop(emulator, ProxyGrid(), cfg)

    rng = np.random.default_rng(1)
    state = {
        "T": jnp.asarray(rng.uniform(220, 300, (ncol, nlev)), jnp.float32),
        "qv": jnp.asarray(np.abs(rng.normal(1e-3, 3e-4, (ncol, nlev))),
                          jnp.float32),
        "qc": jnp.asarray(np.abs(rng.normal(1e-5, 3e-6, (ncol, nlev))),
                          jnp.float32),
        "qi": jnp.asarray(np.abs(rng.normal(1e-5, 3e-6, (ncol, nlev))),
                          jnp.float32),
        "u": jnp.asarray(rng.normal(0, 10, (ncol, nlev)), jnp.float32),
        "v": jnp.asarray(rng.normal(0, 3, (ncol, nlev)), jnp.float32),
    }
    x_sfc = jnp.concatenate([jnp.full((ncol, 1), 1e5),
                             jnp.ones((ncol, 23))], axis=1)
    return loop, emulator, state, mem0, x_sfc, ncol


def timeit(run_fn, warm_args, fetch_ref):
    """Median s/step of run_fn (jitted scalar-returning scan over N_STEPS)."""
    import time
    float(run_fn(*warm_args))
    times = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        float(run_fn(*warm_args))
        times.append(max(time.perf_counter() - t0 - fetch_ref, 1e-9))
    per = [t / N_STEPS for t in times]
    return statistics.median(per), (max(per) - min(per)) / statistics.median(per)


def main():
    import jax
    import jax.numpy as jnp

    results = {}
    t_start = time.time()

    # trivial-fetch cost
    z = jnp.zeros((4, 4))
    triv = jax.jit(lambda m: jnp.sum(m[0, 0]))
    float(triv(z))
    t0 = time.perf_counter()
    for _ in range(3):
        float(triv(z))
    fetch = (time.perf_counter() - t0) / 3
    results["fetch_ms"] = fetch * 1e3
    print(f"# fetch {fetch*1e3:.1f} ms", file=sys.stderr, flush=True)

    # ---- full coupled step across configs
    full_cfgs = [
        ("sphere", True, True), ("sphere", True, False),
        ("sphere", False, False),
        ("flat", True, True), ("flat", True, False), ("flat", False, False),
    ]
    for geom, st_p, em_p in full_cfgs:
        name = (f"step geom={geom} stencil={'pallas' if st_p else 'xla'} "
                f"emu={'pallas' if em_p else 'scan'}")
        try:
            loop, emu, state, mem, x_sfc, ncol = build(geom, st_p, em_p)

            @partial(jax.jit, **_vmem_jkw())
            def run(state, mem):
                st, m, d = loop.rollout(state, mem, x_sfc, N_STEPS)
                return d["mean_T"][-1]

            med, spread = timeit(run, (state, mem), fetch)
            results[name] = {"ms": med * 1e3, "cols_per_s": ncol / med,
                             "spread": spread}
            print(f"# {name}: {med*1e3:.2f} ms ({ncol/med:,.0f} cols/s, "
                  f"spread {spread:.0%})", file=sys.stderr, flush=True)
        except Exception as e:
            results[name] = {"error": f"{type(e).__name__}: {e}"}
            print(f"# {name} FAILED {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)

    # ---- no-advection step (emulator + state advance + diags only)
    for em_p in (True, False):
        name = f"step scheme=none emu={'pallas' if em_p else 'scan'}"
        try:
            loop, emu, state, mem, x_sfc, ncol = build(
                "sphere", False, em_p, scheme="none", fix_water=False)

            @partial(jax.jit, **_vmem_jkw())
            def run(state, mem):
                st, m, d = loop.rollout(state, mem, x_sfc, N_STEPS)
                return d["mean_T"][-1]

            med, spread = timeit(run, (state, mem), fetch)
            results[name] = {"ms": med * 1e3, "cols_per_s": ncol / med,
                             "spread": spread}
            print(f"# {name}: {med*1e3:.2f} ms", file=sys.stderr, flush=True)
        except Exception as e:
            results[name] = {"error": f"{type(e).__name__}: {e}"}
            print(f"# {name} FAILED {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)

    # ---- fixer cost: sphere best stencil, fix_water off
    name = "step geom=sphere stencil=pallas emu=scan fix_water=False"
    try:
        loop, emu, state, mem, x_sfc, ncol = build("sphere", True, False,
                                                   fix_water=False)

        @partial(jax.jit, **_vmem_jkw())
        def run(state, mem):
            st, m, d = loop.rollout(state, mem, x_sfc, N_STEPS)
            return d["mean_T"][-1]

        med, spread = timeit(run, (state, mem), fetch)
        results[name] = {"ms": med * 1e3, "spread": spread}
        print(f"# {name}: {med*1e3:.2f} ms", file=sys.stderr, flush=True)
    except Exception as e:
        results[name] = {"error": f"{type(e).__name__}: {e}"}

    # ---- emulator-only (DCE-safe: accumulate a scalar from out + mem)
    for em_p in (True, False):
        name = f"emulator-only {'pallas' if em_p else 'scan'}"
        try:
            loop, emu, state, mem, x_sfc, ncol = build("sphere", False, em_p,
                                                       scheme="none",
                                                       fix_water=False)
            xm = jnp.stack([state["T"], state["qv"], state["qc"],
                            state["qi"], state["u"], state["v"]], axis=-1)

            @partial(jax.jit, **_vmem_jkw())
            def run(xm, mem):
                def step(carry, _):
                    m, acc = carry
                    out, sfc, m2 = emu(xm, x_sfc, m)
                    return (m2, acc + jnp.sum(out[0, 0])), ()
                (m, acc), _ = jax.lax.scan(step, (mem, 0.0), None,
                                           length=N_STEPS)
                return acc

            med, spread = timeit(run, (xm, mem), fetch)
            results[name] = {"ms": med * 1e3, "cols_per_s": ncol / med,
                             "spread": spread}
            print(f"# {name}: {med*1e3:.2f} ms ({ncol/med:,.0f} cols/s)",
                  file=sys.stderr, flush=True)
        except Exception as e:
            results[name] = {"error": f"{type(e).__name__}: {e}"}
            print(f"# {name} FAILED {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)

    # ---- advection-only (6 fields x 60 levels), all stencil variants
    for geom in ("sphere", "flat"):
        for st_p in (True, False):
            name = (f"advect-only geom={geom} "
                    f"stencil={'pallas' if st_p else 'xla'}")
            try:
                loop, emu, state, mem, x_sfc, ncol = build(geom, st_p, False,
                                                           fix_water=False)

                @jax.jit
                def run(state):
                    def step(st, _):
                        out = loop.advect_all(st, st["u"], st["v"])
                        return out, ()
                    st, _ = jax.lax.scan(step, state, None, length=N_STEPS)
                    return st["T"][0, 0]

                med, spread = timeit(run, (state,), fetch)
                results[name] = {"ms": med * 1e3, "spread": spread}
                print(f"# {name}: {med*1e3:.2f} ms", file=sys.stderr,
                      flush=True)
            except Exception as e:
                results[name] = {"error": f"{type(e).__name__}: {e}"}
                print(f"# {name} FAILED {type(e).__name__}: {e}",
                      file=sys.stderr, flush=True)

    results["wall_seconds"] = time.time() - t_start
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "profile_hybrid_r3.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
