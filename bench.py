"""Benchmark: atmos columns/s/chip on the flagship emulator forward step.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Flagship = the fork-core memory BiGRU emulator (RNNAutoreg, 192/192 hidden,
nh_mem 16, v4_rnn feature set) — the model the online hybrid loop runs per
coupled step. Measured with the fused Pallas BiGRU kernel when it compiles
on the platform, else the scan path.

Methodology: this environment reaches the TPU through a tunnel where
``block_until_ready`` does not synchronize with execution, so the model is
iterated N times on device inside one jitted ``lax.scan`` (serialized via a
data dependency) returning a scalar; the host fetch of that scalar is the
sync, and a trivial-fetch cost is subtracted.

The reference publishes no throughput numbers (SURVEY.md §6);
vs_baseline compares against this project's recorded value below.
"""
import json
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# persistent compile cache (shared with the test suite's tests/.jax_cache
# sibling): big programs through the remote-compile tunnel take minutes;
# warm runs skip that entirely
def _enable_compile_cache():
    try:
        import jax
        cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "tests", ".jax_cache")
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

_enable_compile_cache()

# Recorded round-1 value (columns/s/chip, memory-BiGRU forward, scan-bf16
# on one v5e chip). vs_baseline = value / BASELINE_VALUE.
# NOTE: tunnel throughput varies +-40% between processes; baseline set to
# a conservative mid-range value. Best observed: scan-bf16 1.63e6;
# pallas-bf16 full-model 1.64e6 in a process where scan=1.06e6 (1.55x),
# kernel-level 2.58e6.
BASELINE_VALUE = 1.0e6


def build(use_pallas: bool, bf16: bool = False):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from climsim_tpu.grid import Grid
    from climsim_tpu.models.rnn import RNNAutoreg
    from climsim_tpu.models import BF16, F32

    g = Grid.from_file(
        "/root/reference/grid_info/ClimSim_low-res_grid-info.nc")
    hyam = tuple(float(x) for x in np.asarray(g.hyam))
    hybm = tuple(float(x) for x in np.asarray(g.hybm))
    model = RNNAutoreg(nx=15, nx_sfc=24, ny=6, ny_sfc=8, nneur=(192, 192),
                       nh_mem=16, use_pallas=use_pallas, hyam=hyam,
                       hybm=hybm, sp_mean=9.8e4, sp_div=1e4,
                       policy=BF16 if bf16 else F32)
    B, L = 6144, 60     # 16 timesteps x 384 columns
    xm = jnp.ones((B, L, 15), jnp.float32) * 0.1
    xs = jnp.ones((B, 24), jnp.float32) * 0.1
    mem = jnp.zeros((B, L, 16), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), xm, xs, mem)
    return model, params, xm, xs, mem, B


def measure(model, params, xm, xs, mem, B, N=40):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(params, xm, xs, mem):
        def body(carry, _):
            mem = carry
            out, out_sfc, mem = model.apply(params, xm, xs, mem)
            return mem, ()
        mem, _ = jax.lax.scan(body, mem, None, length=N)
        return jnp.sum(mem[0, 0])

    triv = jax.jit(lambda m: jnp.sum(m[0, 0]))
    float(triv(mem))
    float(loop(params, xm, xs, mem))   # compile

    t0 = time.perf_counter()
    for _ in range(3):
        float(triv(mem))
    fetch = (time.perf_counter() - t0) / 3

    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(loop(params, xm, xs, mem))
        times.append(time.perf_counter() - t0)
    dt = max(min(times) - fetch, 1e-9)
    return B * N / dt


def main():
    best, variant = None, "scan"
    # the level-major fused pallas kernel (auto 512-row VMEM tiles) beats
    # the XLA scan ~1.4x at these shapes (PERFORMANCE.md)
    for use_pallas, bf16, name in ((True, True, "pallas-bf16"),
                                   (False, True, "scan-bf16"),
                                   (False, False, "scan-f32")):
        try:
            cols = measure(*build(use_pallas, bf16))
            print(f"# {name}: {cols:,.0f} cols/s", file=sys.stderr)
            if best is None or cols > best:
                best, variant = cols, name
        except Exception as e:
            print(f"# {name} variant failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
    if best is None:
        print(json.dumps({"metric": "atmos columns/s/chip (RNN emulator)",
                          "value": 0.0, "unit": "columns/s",
                          "vs_baseline": 0.0}))
        return

    vs = 1.0 if BASELINE_VALUE is None else best / BASELINE_VALUE
    print(json.dumps({
        "metric": f"atmos columns/s/chip (memory-BiGRU emulator fwd, "
                  f"{variant})",
        "value": round(best, 1),
        "unit": "columns/s",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
