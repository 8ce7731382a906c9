"""Round-5 decomposition of the non-emulator residual of the coupled step.

The v6 emulator is AT its 13.1 ms serialized MXU+VPU floor
(docs/kernels.md roofline) but the production step records 14.84 ms —
this driver isolates the ~1.7 ms residual (stencil, fixers, layout glue)
at the winning v6 arm, with bench.py's on-device-scan methodology.
Writes artifacts/profile_hybrid_r5.json.

Run serialized with other TPU work:
  timeout 2400 python artifacts/profile_hybrid_r5.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

bench._enable_compile_cache()

HI = (120, 180, 60)


def emulator_standalone():
    """v6 emulator alone in a memory-threaded scan (the 13.1 ms floor)."""
    import jax
    import jax.numpy as jnp
    loop, state, mem, x_sfc, ncol = bench.build(HI, True, True,
                                                fuse_heads=True,
                                                fuse_init=True)
    nlev = HI[2]
    xm = jnp.stack([state[k].T for k in ("T", "qv", "qc", "qi", "u", "v")],
                   axis=1)

    def run(mem):
        def step(mem, _):
            pt, sfc, mem = loop.emulator(xm, x_sfc, mem)
            return mem, pt[0, 0, 0]
        mem, outs = jax.lax.scan(step, mem, None, length=bench.N_STEPS)
        return outs[-1]

    import statistics
    from functools import partial
    jrun = jax.jit(run)
    triv = jax.jit(lambda m: jnp.sum(m[0, 0]))
    float(triv(mem)); float(jrun(mem))
    t0 = time.perf_counter()
    for _ in range(3):
        float(triv(mem))
    fetch = (time.perf_counter() - t0) / 3
    times = []
    for _ in range(bench.REPEATS):
        t0 = time.perf_counter()
        float(jrun(mem))
        times.append(max(time.perf_counter() - t0 - fetch, 1e-9))
    return statistics.median(times) / bench.N_STEPS


def main():
    res = {}
    cases = [
        ("full_production", dict(fix_water=True, fix_energy=True)),
        ("no_energy_fixer", dict(fix_water=True, fix_energy=False)),
        ("no_fixers", dict(fix_water=False, fix_energy=False)),
        ("no_advection", dict(fix_water=False, fix_energy=False,
                              scheme="none")),
    ]
    for name, kw in cases:
        try:
            med, spread = bench.measure(*bench.build(
                HI, True, True, fuse_heads=True, fuse_init=True, **kw))
            res[name] = round(med * 1e3, 3)
            print(f"{name}: {med*1e3:.2f} ms/step (spread {spread:.0%})",
                  flush=True)
        except Exception as e:
            print(f"{name} FAILED: {type(e).__name__}: {e}", flush=True)
            res[name] = None
    try:
        es = emulator_standalone()
        res["emulator_standalone"] = round(es * 1e3, 3)
        print(f"emulator_standalone: {es*1e3:.2f} ms/step", flush=True)
    except Exception as e:
        print(f"emulator_standalone FAILED: {e}", flush=True)

    if res.get("full_production") and res.get("no_fixers"):
        res["fixers_ms"] = round(res["full_production"] - res["no_fixers"],
                                 3)
    if res.get("no_fixers") and res.get("no_advection"):
        res["advection_ms"] = round(res["no_fixers"] - res["no_advection"],
                                    3)
    if res.get("no_advection") and res.get("emulator_standalone"):
        res["glue_ms"] = round(res["no_advection"]
                               - res["emulator_standalone"], 3)
    out = os.path.join(os.path.dirname(__file__),
                       "profile_hybrid_r5.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
