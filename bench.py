"""Benchmark: atmos columns/s/chip on the ONLINE HYBRID COUPLED STEP.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", ...}.

This measures the BASELINE.json headline metric directly: one 20-minute
coupled step of the hybrid system — flagship memory-BiGRU emulator
(RNNAutoreg 192/192, nh_mem 16, bf16 compute) + finite-volume advection
+ state advance + water fixer — on the high-res-scale proxy grid
(21,600 columns, 120x180) and at the canonical low-res batch
(384 columns, 16x24). Step semantics mirror the reference's online
coupling contract (rnn/save_wrapper_mem_prevtend_ftorch.py:430-510:
raw-units state in, tendencies applied by the host, memory threaded).

Methodology: ``block_until_ready`` does not synchronize through the TPU
tunnel, so N coupled steps run on device inside one jitted ``lax.scan``
(serialized by the autoregressive data dependency) returning a scalar;
the host fetch of that scalar is the sync, and the trivial-fetch cost is
subtracted. >=5 repeats; the MEDIAN is the number of record (tunnel
throughput varies between processes; the same-process pallas/XLA ratio
is reported as the variance-immune companion number).

vs_baseline compares against this project's round-1 recorded value
(16.6 ms / 21,600 columns = 1.30e6 cols/s, PERFORMANCE.md); the
reference publishes no throughput numbers (SURVEY.md §6).
"""
import json
import os
import statistics
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


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

# Round-1 value of record: hybrid coupled step, 21,600 columns, bf16
# emulator + fused pallas stencil on one v5e chip (PERFORMANCE.md).
BASELINE_VALUE = 1.30e6   # columns/s/chip
N_STEPS = 20
REPEATS = 7


def build(ncol_shape, stencil_pallas: bool, emulator_pallas: bool,
          fuse_heads: bool = False, fix_energy: bool = True,
          fuse_init: bool = False, scheme: str = "fv",
          fix_water: bool = True):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from climsim_tpu.models.rnn import RNNAutoreg
    from climsim_tpu.models import BF16
    from climsim_tpu.online import HybridLoop, HostLoopConfig

    nlat, nlon, nlev = ncol_shape
    ncol = nlat * nlon
    # fuse_heads=True selects the v5 channel-major fused kernel
    # (in-kernel up projection + latent/output heads, [L, C, B]
    # activations: batch rides the 128 lanes so narrow arrays cost no
    # padding). It runs under a PLAIN jit since the round-4 Mosaic
    # vmem_limit declaration, and beats v2 since the round-4 tiler fix
    # (fewest-tiles-first for ragged batches: the serial level chain
    # runs once per tile, so 169 pad-minimizing tiles at B=21,600 were
    # ~2x slower than 16 large ones). With fuse_init the v6 kernel
    # evaluates the initial MLP in-kernel from raw features. Measured
    # production step: 14.84 ms (v6) / 15.5 (v5) / 16.5 (v2).
    model = RNNAutoreg(nx=6, nx_sfc=24, ny=6, ny_sfc=8, nneur=(192, 192),
                       nh_mem=16, add_pres=False, policy=BF16,
                       use_pallas=emulator_pallas, fuse_heads=fuse_heads,
                       fuse_init=fuse_init, level_major=fuse_heads)
    # channel-major [L, C, B] activations in the fused path (see
    # RNNAutoreg.level_major)
    xm_shape = (nlev, 6, ncol) if fuse_heads else (ncol, nlev, 6)
    mem_shape = (nlev, 16, ncol) if fuse_heads else (ncol, nlev, 16)
    xm = jnp.ones(xm_shape, jnp.float32) * 0.1
    xs = jnp.ones((ncol, 24), jnp.float32) * 0.1
    mem0 = jnp.zeros(mem_shape, jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), xm, xs, mem0)

    xscale = jnp.asarray([250.0, 1e-3, 1e-5, 1e-5, 10.0, 10.0])
    yscale = jnp.asarray([1e-5, 1e-8, 1e-9, 1e-9, 1e-5, 1e-5])
    xsc = xscale[:, None] if fuse_heads else xscale
    ysc = yscale[:, None] if fuse_heads else yscale

    def emulator(x_main_raw, x_sfc_raw, mem):
        xn = (x_main_raw / xsc).astype(jnp.float32)
        out, out_sfc, mem = model.apply(params, xn, x_sfc_raw, mem)
        return out * ysc, out_sfc, mem

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

    if ncol == 384:
        # canonical low-res case runs on the REAL ne4 grid: actual column
        # lat/lon layout (gather/scatter through the latitude-band proxy)
        # and the area x dp/g weighted fixer (data_utils.py:74)
        from climsim_tpu.grid import Grid
        grid = Grid.from_file(
            "/root/reference/grid_info/ClimSim_low-res_grid-info.nc")
    else:
        grid = ProxyGrid()
    # fix_water + fix_energy = the certified production step (the
    # stability-run config and the driver dryrun both run both fixers;
    # round-3 VERDICT weak #6)
    cfg = HostLoopConfig(nlat=nlat, nlon=nlon, scheme=scheme,
                         use_pallas=stencil_pallas, fix_water=fix_water,
                         fix_energy=fix_energy,
                         emulator_level_major=fuse_heads)
    loop = HybridLoop(emulator, grid, cfg)

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
    return loop, state, mem0, x_sfc, ncol


def measure(loop, state, mem, x_sfc, ncol, repeats=REPEATS,
            jit_kwargs=None):
    """Median seconds per coupled step over `repeats` timed runs."""
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, **(jit_kwargs or {}))
    def run(state, mem):
        st, m, diags = loop.rollout(state, mem, x_sfc, N_STEPS)
        return diags["mean_T"][-1]

    triv = jax.jit(lambda m: jnp.sum(m[0, 0]))
    float(triv(mem))
    float(run(state, mem))            # compile + warm
    t0 = time.perf_counter()
    for _ in range(3):
        float(triv(mem))
    fetch = (time.perf_counter() - t0) / 3

    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(run(state, mem))
        times.append(max(time.perf_counter() - t0 - fetch, 1e-9))
    per_step = [t / N_STEPS for t in times]
    med = statistics.median(per_step)
    spread = (max(per_step) - min(per_step)) / med
    return med, spread


def build_train(B, pallas: bool, W: int = 4, n_updates: int = 8):
    """Production-shape rollout TRAINING update (round-5 VERDICT item 2):
    a W-step BPTT window on the flagship model (192/192, nh_mem 16, bf16
    compute, remat on the window step as the longwindows conf runs it),
    full fwd+bwd+adam, N updates serialized in one on-device lax.scan by
    the params/memory data dependency. The pallas arm runs the v6
    channel-major kernels BOTH directions (the round-5 hand-written cm
    backward); the control is the XLA scan model. Mirrors the
    reference's hot loop (rnn/utils.py:1199-1376)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from climsim_tpu.models.rnn import RNNAutoreg
    from climsim_tpu.models import BF16

    L = 60
    model = RNNAutoreg(nx=6, nx_sfc=24, ny=6, ny_sfc=8, nneur=(192, 192),
                       nh_mem=16, add_pres=False, policy=BF16,
                       use_pallas=pallas, fuse_heads=pallas,
                       fuse_init=pallas, level_major=pallas)
    lm = pallas
    rng = np.random.default_rng(3)
    r = lambda *s: jnp.asarray(rng.normal(0, 0.3, s), jnp.float32)
    if lm:
        xw, yw = r(W, L, 6, B), r(W, L, 6, B)
        mem0 = jnp.zeros((L, 16, B), jnp.float32)
    else:
        xw, yw = r(W, B, L, 6), r(W, B, L, 6)
        mem0 = jnp.zeros((B, L, 16), jnp.float32)
    sw, ysw = r(W, B, 24), r(W, B, 8)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), xw[0], sw[0],
                                 mem0)
    tx = optax.adam(1e-4)
    opt0 = tx.init(params)

    def window_loss(p, mem):
        def step(mem, inp):
            x, s, y, ys = inp
            out, osfc, mem = model.apply(p, x, s, mem)
            l = jnp.mean((out - y) ** 2) + jnp.mean((osfc - ys) ** 2)
            return mem, l
        step = jax.checkpoint(step, prevent_cse=False)
        mem, ls = jax.lax.scan(step, mem, (xw, sw, yw, ysw))
        return jnp.mean(ls), mem

    def run(params, opt, mem):
        def update(carry, _):
            p, o, m = carry
            (loss, m), grads = jax.value_and_grad(
                window_loss, has_aux=True)(p, m)
            upd, o = tx.update(grads, o, p)
            p = optax.apply_updates(p, upd)
            return (p, o, m), loss
        (params, opt, mem), losses = jax.lax.scan(
            update, (params, opt, mem), None, length=n_updates)
        return losses[-1]

    return run, (params, opt0, mem0), W * B * n_updates


def measure_train(B=21600, W=4, n_updates=8, repeats=5):
    """Median ms per training update for the pallas and scan arms; the
    N-scaled methodology (timing a scan of n_updates serialized updates,
    trivial-fetch subtracted) validates per-iteration cost the same way
    the inference bench does."""
    import jax
    import jax.numpy as jnp
    out = {}
    for pallas in (True, False):
        run, args, _ = build_train(B, pallas, W, n_updates)
        jrun = jax.jit(run)
        triv = jax.jit(lambda m: jnp.sum(m[0, 0]))
        float(triv(args[2]))
        float(jrun(*args))              # compile + warm
        t0 = time.perf_counter()
        for _ in range(3):
            float(triv(args[2]))
        fetch = (time.perf_counter() - t0) / 3
        times = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(jrun(*args))
            times.append(max(time.perf_counter() - t0 - fetch, 1e-9))
        per_upd = statistics.median(times) / n_updates
        name = "pallas" if pallas else "scan"
        out[name] = per_upd
        print(f"# train B={B} W={W} [{name}]: {per_upd*1e3:.2f} ms/update"
              f" ({W * B / per_upd:,.0f} col-steps/s)", file=sys.stderr)
    return out


def calibrate():
    """Chip-state probe: a fixed compute-bound bf16 matmul chain
    (512 serialized [2048x2048]@[2048x2048] = 8.8 TFLOP, ~24 ms at the
    v5e's ~85%-of-peak matmul rate), trivial-fetch subtracted. The
    tunnel/chip intermittently enters whole-process ~2x-degraded windows
    (PERFORMANCE.md round-3 caveat); this number lets a reader judge the
    chip state of THIS run without touching the honest raw headline."""
    import jax
    import jax.numpy as jnp
    k = jax.random.PRNGKey(0)
    a = jax.random.normal(k, (2048, 2048), jnp.bfloat16)

    @jax.jit
    def chain(a):
        def body(x, _):
            x = jnp.dot(x, a, preferred_element_type=jnp.float32)
            return (x / (jnp.abs(x).max() + 1.0)).astype(jnp.bfloat16), ()
        x, _ = jax.lax.scan(body, a, None, length=512)
        return jnp.sum(x[0, 0].astype(jnp.float32))

    # HBM probe: 32 serialized full read+write passes over a 268 MB f32
    # buffer = 17 GB of traffic, ~21 ms at the v5e's ~800 GB/s
    b = jax.random.normal(k, (8192, 8192), jnp.float32)

    @jax.jit
    def hbm_chain(b):
        def body(x, _):
            return x * 1.0000001 + 1e-12, ()
        x, _ = jax.lax.scan(body, b, None, length=32)
        return jnp.sum(x[0, :4])

    triv = jax.jit(lambda a: jnp.sum(a[0, 0].astype(jnp.float32)))
    float(triv(a))
    float(chain(a))
    float(hbm_chain(b))
    t0 = time.perf_counter()
    for _ in range(3):
        float(triv(a))
    fetch = (time.perf_counter() - t0) / 3

    def med(fn, arg):
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(fn(arg))
            times.append(max(time.perf_counter() - t0 - fetch, 1e-9))
        return statistics.median(times) * 1e3

    return med(chain, a), med(hbm_chain, b)


def main():
    HI = (120, 180, 60)   # 21,600 columns (high-res ncol)
    LO = (16, 24, 60)     # 384 columns  (low-res canonical batch)

    results = {}
    try:
        calib_mxu, calib_hbm = calibrate()
        print(f"# calib: mxu {calib_mxu:.2f} ms, hbm {calib_hbm:.2f} ms",
              file=sys.stderr)
    except Exception:
        calib_mxu = calib_hbm = None
    # pallas stencil + fused channel-major pallas emulator is the
    # production config (v5 kernel under a PLAIN jit since the round-4
    # vmem-declaration + tile-count fixes); fall back if a variant fails
    # to compile on this platform
    hi_best, hi_cfg, hi_spread = None, None, None
    for stencil, emul, fuse, finit in (
            (True, True, True, True),      # v6: + in-kernel init MLP
            (True, True, True, False),     # v5 channel-major fused
            (True, True, False, False),    # v2 batch-major kernel
            (True, False, False, False), (False, False, False, False)):
        try:
            med, spread = measure(*build(HI, stencil, emul,
                                         fuse_heads=fuse,
                                         fuse_init=finit))
            cols = HI[0] * HI[1] / med
            emu_name = ("pallas-fused-init" if finit else "pallas-fused"
                        if fuse else "pallas" if emul else "scan")
            name = f"stencil={'pallas' if stencil else 'xla'}+" \
                   f"emu={emu_name}"
            print(f"# hybrid 21600 cols [{name}]: {med*1e3:.2f} ms/step "
                  f"({cols:,.0f} cols/s, spread {spread:.0%})",
                  file=sys.stderr)
            results[name] = cols
            if hi_best is None or cols > hi_best:
                hi_best, hi_spread = cols, spread
                hi_cfg = (stencil, emul, fuse, finit)
        except Exception as e:
            print(f"# hybrid 21600 variant ({stencil},{emul},{fuse},{finit}) "
                  f"failed: {type(e).__name__}: {e}", file=sys.stderr)

    lo_cols = None
    if hi_cfg is not None:
        try:
            med, _ = measure(*build(LO, hi_cfg[0], hi_cfg[1],
                                    fuse_heads=hi_cfg[2],
                                    fuse_init=hi_cfg[3]))
            lo_cols = LO[0] * LO[1] / med
            print(f"# hybrid 384 cols: {med*1e3:.3f} ms/step "
                  f"({lo_cols:,.0f} cols/s)", file=sys.stderr)
        except Exception as e:
            print(f"# hybrid 384 failed: {type(e).__name__}: {e}",
                  file=sys.stderr)

    if hi_best is None:
        print(json.dumps({"metric": "atmos columns/s/chip "
                          "(online hybrid coupled step, 21600 cols)",
                          "value": 0.0, "unit": "columns/s",
                          "vs_baseline": 0.0}))
        return

    # training-throughput number of record (round-5 VERDICT item 2)
    train = {}
    try:
        tr = measure_train()
        train = {
            "train_ms_per_update": round(tr["pallas"] * 1e3, 2),
            "train_cols_per_s": round(4 * 21600 / tr["pallas"], 1),
            "train_pallas_vs_xla": round(tr["scan"] / tr["pallas"], 3),
        }
    except Exception as e:
        print(f"# train bench failed: {type(e).__name__}: {e}",
              file=sys.stderr)

    # variance-immune companion: same-process pallas/xla ratio
    ratio = None
    a = results.get("stencil=pallas+emu=pallas-fused-init") or \
        results.get("stencil=pallas+emu=pallas-fused") or \
        results.get("stencil=pallas+emu=pallas") or \
        results.get("stencil=pallas+emu=scan")
    b = results.get("stencil=xla+emu=scan")
    if a and b:
        ratio = round(a / b, 3)

    # simulated years per wall day: 1200 simulated s per step / 365 days
    sypd = (1200.0 * hi_best / (HI[0] * HI[1])) / 365.0
    out = {
        "metric": "atmos columns/s/chip (online hybrid coupled step, "
                  "21600 cols, bf16 BiGRU emulator + FV advection)",
        "value": round(hi_best, 1),
        "unit": "columns/s",
        "vs_baseline": round(hi_best / BASELINE_VALUE, 3),
        "median_of": REPEATS,
        "spread": round(hi_spread, 3) if hi_spread is not None else None,
        "pallas_vs_xla_same_process": ratio,
        "cols_per_s_384": round(lo_cols, 1) if lo_cols else None,
        "sypd_highres": round(sypd, 1),
        # chip-state calibration (PERFORMANCE.md round-3 caveat): MXU
        # probe = 8.8 TFLOP serialized matmul chain; HBM probe = 17 GB
        # read+write chain (~21 ms at ~800 GB/s healthy)
        "calib_mxu_ms": round(calib_mxu, 2) if calib_mxu else None,
        "calib_hbm_ms": round(calib_hbm, 2) if calib_hbm else None,
        **train,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
