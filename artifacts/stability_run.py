"""Long-horizon hybrid stability run (multi-year, on-chip).

The reference's online evaluation demonstrates multi-year stability of the
coupled E3SM-MMF + NN system and scores it with error-growth / zonal-bias /
precipitation-statistics notebooks (online_testing/README.md §5-6,
online_testing/evaluation/*.ipynb). This driver reproduces that evidence
for the TPU framework end-to-end with the balanced synthetic truth climate
(data/synthetic.equilibrium_physics) standing in for E3SM-MMF (the real
dataset/model blobs are stripped from this environment):

1. spin the truth climate (equilibrium physics + spherical FV advection on
   the REAL ne4 low-res geometry, diurnal insolation cycle) to its attractor;
2. generate a coupled truth trajectory and train the flagship RNNAutoreg
   emulator on it with the semi-online scheme (train/rollout.py — the
   reference's rnn/utils.py:994-1060 state-advance training);
3. couple the TRAINED emulator back into the hybrid loop and run it for
   years of simulated time alongside the truth, recording per-step drift,
   physical-units conservation, precipitation statistics, and
   model-vs-truth error growth;
4. write artifacts: stability_run.jsonl (per-chunk series),
   stability_run.json (summary), stability_run.png (figure set),
   stability_emulator.msgpack (trained weights).

Usage:
  python artifacts/stability_run.py                # full run on the TPU
  python artifacts/stability_run.py --platform cpu --quick   # CPU smoke
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

GRID = "/root/reference/grid_info/ClimSim_low-res_grid-info.nc"


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--platform", default=None,
                   help="cpu to force CPU (default: whatever jax has)")
    p.add_argument("--steps", type=int, default=78840,
                   help="coupled steps for the stability run "
                        "(78840 = 3 simulated years at dt=1200s)")
    p.add_argument("--spinup", type=int, default=10800,
                   help="truth spin-up steps (10800 = 150 days)")
    p.add_argument("--train-steps", type=int, default=1440,
                   help="truth trajectory length for training data")
    p.add_argument("--epochs", type=int, default=70)
    p.add_argument("--chunk", type=int, default=720,
                   help="scan-chunk length for the long run (10 days)")
    p.add_argument("--quick", action="store_true",
                   help="tiny settings for a CPU smoke test")
    p.add_argument("--nneur", type=int, default=192)
    p.add_argument("--amp-max", type=float, default=6.0,
                   help="peak off-attractor T perturbation [K] for the "
                        "segmented training data (0 = attractor only)")
    p.add_argument("--w-water", type=float, default=0.0,
                   help="water-conservation loss weight (RolloutConfig "
                        "w_water; reference w_wcon)")
    p.add_argument("--w-energy", type=float, default=0.0,
                   help="energy-conservation loss weight (w_hcon)")
    p.add_argument("--lr", type=float, default=2e-3)
    p.add_argument("--lr-gamma", type=float, default=0.7)
    p.add_argument("--no-fix-energy", action="store_true",
                   help="disable the host-loop energy epilogue")
    p.add_argument("--skip-scoreboard", action="store_true")
    p.add_argument("--no-lat-feature", action="store_true",
                   help="drop the cos/sin-latitude input features")
    p.add_argument("--load-emulator", default=None,
                   help="msgpack path: skip training and load these "
                        "weights (the collection/normalization stage is "
                        "deterministic per seed, so stats match the "
                        "original run)")
    p.add_argument("--env-restore-tau", type=float, default=5.0,
                   help="envelope-restoring timescale [days]; 0 disables. "
                        "Outside the per-level training T envelope the NN "
                        "input is clipped (it extrapolates blindly), so "
                        "nothing pulls the STATE back — round 3's hybrid "
                        "developed a 110 K polar cold pool this way. The "
                        "restoring term relaxes out-of-envelope T toward "
                        "the envelope edge (the state-space analog of the "
                        "reference wrapper's input clipping, "
                        "save_wrapper_mem_prevtend_ftorch.py:199-249)")
    p.add_argument("--env-margin", type=float, default=5.0,
                   help="envelope margin [K] beyond the training min/max")
    p.add_argument("--env-restore-qc", type=float, default=0.0,
                   help="condensate (qc AND qi) envelope-restoring "
                        "timescale [days]; 0 disables. The round-5 "
                        "precip decomposition (diag_r5_parts.json) shows "
                        "the hybrid accumulates 33x the truth's ice "
                        "path: the dqi training signal is trace-level "
                        "noise (online R2_dqice ~ 0), so nothing removes "
                        "ice once the NN under-predicts its sink — the "
                        "same un-damped state-drift mechanism as the "
                        "round-4 cold pool, on the condensate channels")
    p.add_argument("--env-restore-rh", type=float, default=0.0,
                   help="relative-humidity envelope-restoring timescale "
                        "[days]; 0 disables. Clamps qv above the "
                        "per-level p99 of TRAINING rh (supersaturation "
                        "pockets are the dqv twin of the condensate "
                        "random-walk rectification: truth physics "
                        "removes them within tau_cond, the NN's "
                        "imperfect dqv leaves them standing)")
    p.add_argument("--env-restore-qv", type=float, default=0.0,
                   help="qv envelope-restoring timescale [days]; 0 "
                        "disables. Same mechanism as --env-restore-tau "
                        "but on the per-level qv training envelope (the "
                        "round-4 water ratio 0.961 suggests the q state "
                        "drifts too)")
    p.add_argument("--precc-consistency", action="store_true",
                   help="replace the NN's precc/precsc diagnostic "
                        "channels with the column-moisture-sink implied "
                        "by its OWN predicted tendencies plus the known "
                        "surface evaporation flux (physical consistency: "
                        "P = E - d/dt column water; the truth physics "
                        "closes this identity by construction, "
                        "data/synthetic.py::equilibrium_physics)")
    p.add_argument("--qv-perturb", type=float, default=0.12,
                   help="peak fractional qv perturbation for segmented "
                        "training data (precip-branch coverage)")
    p.add_argument("--onpolicy-rounds", type=int, default=0,
                   help="rounds of on-policy (hybrid-state) fine-tuning: "
                        "run the current hybrid, label its states with "
                        "the truth physics, fine-tune on the mixture "
                        "(DAgger-style distribution-shift fix; round-5 "
                        "precip/zonal-bias lever)")
    p.add_argument("--onpolicy-steps", type=int, default=640,
                   help="hybrid trajectory steps collected per round")
    p.add_argument("--onpolicy-spin", type=int, default=1080,
                   help="hybrid steps run (not recorded) before each "
                        "round's collection, so the data sample the "
                        "DRIFTED hybrid climate (the bias equilibrates "
                        "over ~2 weeks), not the early transient")
    p.add_argument("--onpolicy-epochs", type=int, default=24,
                   help="fine-tune epochs per round")
    p.add_argument("--onpolicy-lr", type=float, default=5e-4,
                   help="fine-tuning learning rate")
    p.add_argument("--xprotocol-steps", type=int, default=360,
                   help="steps of paired trajectory recording for the "
                        "cross-protocol (2x2 states x memory) scoreboard")
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "stability_run"))
    return p.parse_args()


def main():
    args = parse_args()
    if args.quick:
        args.steps = min(args.steps, 216)
        args.spinup = min(args.spinup, 144)
        args.train_steps = min(args.train_steps, 96)
        args.epochs = min(args.epochs, 3)
        args.chunk = min(args.chunk, 72)
        args.nneur = min(args.nneur, 32)

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    # persistent compile cache (shared with the test suite)
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "..", "tests", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import jax.numpy as jnp
    import numpy as np
    from climsim_tpu import constants as C
    from climsim_tpu.grid import Grid
    from climsim_tpu.online import HybridLoop, HostLoopConfig
    from climsim_tpu.data.synthetic import (EquilibriumConfig,
                                            equilibrium_forcing,
                                            equilibrium_emulator)
    from climsim_tpu.physics import thermo
    from climsim_tpu.models.rnn import RNNAutoreg
    from climsim_tpu.train.rollout import RolloutTrainer, RolloutConfig
    from climsim_tpu.data.loader import chunkize

    t_wall0 = time.time()
    g = Grid.from_file(GRID)
    ncol, nlev = 384, 60
    # the diurnal cycle replaces the static forcing's coszrs ~ cos(lat)
    # with a daily mean of cos(lat)/pi, so the solar Teq sensitivity is
    # scaled by pi to keep the same time-mean climate (warm equator,
    # active hydrology)
    eq_cfg = EquilibriumConfig(t_sfc_solar=62.0 * 3.14159265)
    base_sfc = equilibrium_forcing(jax.random.PRNGKey(0), g, ncol)
    # diurnal insolation: SOLIN = solar constant, COSZRS(t) from the real
    # column lat/lon at perpetual equinox (hour angle advances 2*pi/day)
    lat = np.asarray(g.lat)[:ncol]
    lon = np.asarray(g.lon)[:ncol]
    coslat_j = jnp.asarray(np.cos(np.deg2rad(lat)), jnp.float32)
    lonrad_j = jnp.asarray(np.deg2rad(lon), jnp.float32)
    base_sfc = base_sfc.at[:, 1].set(1360.0)
    omega_day = 2.0 * np.pi * C.DT_STEP / 86400.0

    def sfc_at(tstep):
        mu = coslat_j * jnp.cos(lonrad_j + omega_day * tstep)
        return base_sfc.at[:, 2].set(jnp.maximum(mu, 0.0))

    truth = equilibrium_emulator(g, eq_cfg)
    loop_cfg = HostLoopConfig(scheme="fv", fix_water=True,
                              fix_energy=not args.no_fix_energy,
                              geometry="sphere")
    truth_loop = HybridLoop(truth, g, loop_cfg)

    # physical-units weights for global means (dp/g x area_wgt, the
    # reference's area-weighted integrals, climsim_utils/data_utils.py:74)
    w_phys = g.mass_weights(base_sfc[:, 0]) * g.area_wgt[:ncol, None]
    wsum = jnp.sum(w_phys)
    wmean = lambda f: jnp.sum(w_phys * f) / wsum

    def init_state(seed=1):
        rng = np.random.default_rng(seed)
        coslat = np.cos(np.deg2rad(lat))
        s = np.linspace(0, 1, nlev)
        T = (205.0 + (235 + 62 * coslat[:, None] - 205.0)
             * s[None, :] ** 1.1 + rng.normal(0, 2, (ncol, nlev)))
        pmid = g.mid_pressure(base_sfc[:, 0])
        qv = 0.6 * thermo.qsat(jnp.asarray(T, jnp.float32), pmid)
        return {
            "T": jnp.asarray(T, jnp.float32),
            "qv": jnp.asarray(qv, jnp.float32),
            "qc": jnp.full((ncol, nlev), 1e-6, jnp.float32),
            "qi": jnp.full((ncol, nlev), 1e-6, jnp.float32),
            "u": jnp.asarray(rng.normal(0, 5, (ncol, nlev)), jnp.float32),
            "v": jnp.asarray(rng.normal(0, 2, (ncol, nlev)), jnp.float32),
        }

    # ------------------------------------------------------------ 1. spin-up
    dummy_mem = jnp.zeros((ncol, 1, 1), jnp.float32)

    @jax.jit
    def spin_chunk(st, t0):
        def step(carry, dt_i):
            st, m = carry
            st, m, _ = truth_loop.coupled_step(st, m, sfc_at(t0 + dt_i))
            return (st, m), ()
        (st, _), _ = jax.lax.scan(step, (st, dummy_mem),
                                  jnp.arange(args.chunk))
        return st

    state = init_state()
    print(f"[{time.time()-t_wall0:7.1f}s] spin-up {args.spinup} steps...",
          flush=True)
    t = 0
    while t < args.spinup:
        state = spin_chunk(state, jnp.int32(t))
        t += args.chunk
    jax.block_until_ready(state["T"])
    Tm0 = float(wmean(state["T"]))
    print(f"[{time.time()-t_wall0:7.1f}s] spin-up done, <T>={Tm0:.2f} K",
          flush=True)

    # --------------------------------------------- 2. training data + train
    @jax.jit
    def collect_chunk(st, t0):
        def step(carry, dt_i):
            st, m = carry
            sfc = sfc_at(t0 + dt_i)
            x_raw = jnp.stack([st["T"], st["qv"], st["qc"], st["qi"],
                               st["u"], st["v"]], axis=-1)
            pt, sfc_out = truth(x_raw, sfc, m)[:2]
            st, m, _ = truth_loop.coupled_step(st, m, sfc)
            return (st, m), (x_raw, pt, sfc_out, sfc)
        (st, _), outs = jax.lax.scan(step, (st, dummy_mem),
                                     jnp.arange(160 if not args.quick
                                                else 48))
        return st, outs

    # SEGMENTED collection with off-attractor perturbations: a model
    # trained only on the attractor loses the restoring force under NN
    # extrapolation and the coupled run blows up once drift leaves the
    # training envelope (measured: +7 K by day 10 -> +1300 K by year 5).
    # Each segment starts from a perturbed state (growing amplitude), so
    # the data contain warm/cold/moist anomalies WITH the relaxation
    # tendencies that erase them — the emulator learns to pull back.
    seg_len = 160 if not args.quick else 48   # multiple of chunk_T
    n_seg = max(args.train_steps // seg_len, 1)
    amp_max = args.amp_max                    # K, peak T perturbation

    def perturb(st, key, amp):
        kT, kc, kq, ku, kv = jax.random.split(key, 5)
        colT = jax.random.normal(kT, (ncol, 1))             + 0.5 * jax.random.normal(kc, (ncol, nlev))
        st = dict(st)
        st["T"] = st["T"] + amp * colT
        st["qv"] = jnp.clip(
            st["qv"] * (1.0 + args.qv_perturb * (amp / max(amp_max, 1e-12))
                        * jax.random.normal(kq, (ncol, nlev))), 0.0, None)
        st["u"] = st["u"] + 0.5 * amp * jax.random.normal(
            ku, (ncol, nlev))
        st["v"] = st["v"] + 0.3 * amp * jax.random.normal(
            kv, (ncol, nlev))
        return st

    xs_raw, ys_raw, ysfc_raw, sfc_ts = [], [], [], []
    t_off = args.spinup
    collected = 0
    base_state = state
    for seg in range(n_seg):
        amp = amp_max * seg / max(n_seg - 1, 1)   # seg 0 unperturbed
        seg_state = perturb(base_state, jax.random.PRNGKey(100 + seg),
                            amp) if seg else base_state
        seg_left = seg_len
        while seg_left > 0:
            seg_state, (xr, yr, ysf, sf) = collect_chunk(
                seg_state, jnp.int32(t_off + collected))
            n_take = min(seg_left, xr.shape[0])
            xs_raw.append(xr[:n_take])
            ys_raw.append(yr[:n_take])
            ysfc_raw.append(ysf[:n_take])
            sfc_ts.append(sf[:n_take])
            seg_left -= n_take
            collected += n_take
        if seg == 0:
            base_state = seg_state    # attractor state advances
    x_raw = jnp.concatenate(xs_raw)[:args.train_steps]      # [T,B,L,6]
    y_raw = jnp.concatenate(ys_raw)[:args.train_steps]      # [T,B,L,6]
    y_sfc_raw = jnp.concatenate(ysfc_raw)[:args.train_steps]  # [T,B,8]
    sfc_t = jnp.concatenate(sfc_ts)[:args.train_steps]      # [T,B,24]
    state = base_state
    run_t0 = t_off + collected            # where the long run starts
    print(f"[{time.time()-t_wall0:7.1f}s] collected {args.train_steps} "
          "training steps", flush=True)

    # feature construction: 6 prognostic channels + rh + sigma
    # (+ cos/sin latitude — the reference's clat/slat inputs,
    # climsim_adding_input.py — unless --no-lat-feature)
    pmid = g.mid_pressure(base_sfc[:, 0])                   # [B,L]
    sigma = (pmid / base_sfc[:, 0:1]).astype(jnp.float32)
    clat_f = jnp.asarray(np.cos(np.deg2rad(lat)), jnp.float32)
    slat_f = jnp.asarray(np.sin(np.deg2rad(lat)), jnp.float32)
    use_lat = not args.no_lat_feature

    def derived(xr):
        rh = xr[..., 1] / jnp.maximum(thermo.qsat(xr[..., 0], pmid), 1e-8)
        sg = jnp.broadcast_to(sigma, xr.shape[:-1])
        feats = [rh, sg]
        if use_lat:
            feats.append(jnp.broadcast_to(clat_f[:, None], xr.shape[:-1]))
            feats.append(jnp.broadcast_to(slat_f[:, None], xr.shape[:-1]))
        return jnp.stack(feats, axis=-1)

    nx_feat = 6 + 2 + (2 if use_lat else 0)
    feats_raw = jnp.concatenate([x_raw, derived(x_raw)], axis=-1)

    f64 = lambda a: np.asarray(a, np.float64)
    xm = f64(feats_raw.mean(axis=(0, 1, 2)))
    xs_ = np.maximum(f64(feats_raw.std(axis=(0, 1, 2))), 1e-12)
    sfm = f64(sfc_t.mean(axis=(0, 1)))
    sfs = np.maximum(f64(sfc_t.std(axis=(0, 1))), 1e-12)
    # robust scale floor: a channel whose variability collapses (e.g.
    # condensate tendencies in a cloud-free spin-up) must not blow up the
    # normalized loss through 1/std -> the floor bounds |y_n| <= ~1e3
    ysd = f64(y_raw.std(axis=(0, 1, 2)))
    ysd = np.maximum(ysd, np.maximum(
        1e-3 * f64(jnp.abs(y_raw).max(axis=(0, 1, 2))), 1e-30))
    ysfc_sd = f64(y_sfc_raw.std(axis=(0, 1)))
    ysfc_sd = np.maximum(ysfc_sd, np.maximum(
        1e-3 * f64(jnp.abs(y_sfc_raw).max(axis=(0, 1))), 1e-30))
    print("   y std:", np.array2string(ysd, precision=2), flush=True)
    print("   ysfc std:", np.array2string(ysfc_sd, precision=2),
          flush=True)

    xm_j = jnp.asarray(xm, jnp.float32)
    xs_j = jnp.asarray(xs_, jnp.float32)
    sfm_j = jnp.asarray(sfm, jnp.float32)
    sfs_j = jnp.asarray(sfs, jnp.float32)
    yscale_lev = jnp.asarray(1.0 / ysd, jnp.float32)        # [6]
    yscale_sca = jnp.asarray(1.0 / ysfc_sd, jnp.float32)    # [8]

    x_lev_n = ((feats_raw - xm_j) / xs_j).astype(jnp.float32)
    del feats_raw    # free the HBM copy; only the normalized set is kept
    x_sfc_n = ((sfc_t - sfm_j) / sfs_j).astype(jnp.float32)
    # per-channel training envelope for ONLINE input clipping (the
    # reference's wrapper clipping): outside it the NN extrapolates and
    # can lose the restoring force
    xlo = jnp.asarray(np.asarray(x_lev_n.min(axis=(0, 1, 2))))
    xhi = jnp.asarray(np.asarray(x_lev_n.max(axis=(0, 1, 2))))
    slo = jnp.asarray(np.asarray(x_sfc_n.min(axis=(0, 1))))
    shi = jnp.asarray(np.asarray(x_sfc_n.max(axis=(0, 1))))
    # per-level T envelope of the TRAINING data (for the state-space
    # restoring term; --env-restore-tau). Input clipping alone leaves the
    # state free to keep drifting once outside the envelope.
    Tenv_lo = jnp.asarray(np.asarray(x_raw[..., 0].min(axis=(0, 1)))
                          - args.env_margin, jnp.float32)       # [L]
    Tenv_hi = jnp.asarray(np.asarray(x_raw[..., 0].max(axis=(0, 1)))
                          + args.env_margin, jnp.float32)
    tau_env_s = args.env_restore_tau * 86400.0
    # per-level qv training envelope (multiplicative margin: qv spans
    # orders of magnitude across levels, so an additive K-like margin is
    # meaningless)
    Qenv_lo = jnp.asarray(np.asarray(x_raw[..., 1].min(axis=(0, 1)))
                          * 0.5, jnp.float32)                   # [L]
    Qenv_hi = jnp.asarray(np.asarray(x_raw[..., 1].max(axis=(0, 1)))
                          * 1.5, jnp.float32)
    tau_qenv_s = args.env_restore_qv * 86400.0
    # condensate envelopes: per-level 95th PERCENTILE of the training
    # distribution, one-sided (condensate legitimately reaches 0). A
    # max-based envelope is useless here: the hybrid's 33x ice-path
    # accumulation (diag_r5_parts) is a clipped-random-walk rectification
    # of a trace channel — NN tendency noise with the state clipped at 0
    # inflates the MEAN far above truth while staying under the training
    # max (perturbed-segment bursts). Relaxing the top-5%-of-training
    # exceedances removes the spurious reservoir while touching ~5% of
    # points in a truth-like state by construction.
    QCenv_hi = jnp.asarray(np.percentile(
        np.asarray(x_raw[..., 2]), 95, axis=(0, 1)), jnp.float32)
    QIenv_hi = jnp.asarray(np.percentile(
        np.asarray(x_raw[..., 3]), 95, axis=(0, 1)), jnp.float32)
    tau_cenv_s = args.env_restore_qc * 86400.0
    # per-level p99 of training relative humidity (--env-restore-rh)
    rh_train = np.asarray(x_raw[..., 1]) / np.maximum(
        np.asarray(thermo.qsat(x_raw[..., 0], pmid)), 1e-8)
    RHenv_hi = jnp.asarray(np.percentile(rh_train, 99, axis=(0, 1)),
                           jnp.float32)
    tau_rhenv_s = args.env_restore_rh * 86400.0
    y_lev_n = (y_raw * yscale_lev).astype(jnp.float32)
    y_sfc_n = (y_sfc_raw * yscale_sca).astype(jnp.float32)
    for nm, a in (("x_lev_n", x_lev_n), ("x_sfc_n", x_sfc_n),
                  ("y_lev_n", y_lev_n), ("y_sfc_n", y_sfc_n)):
        print(f"   {nm}: max|.|={float(jnp.abs(a).max()):.3e} "
              f"finite={bool(jnp.isfinite(a).all())}", flush=True)
    sp_t = jnp.broadcast_to(base_sfc[:, 0][None], sfc_t.shape[:2])

    nh_mem = 16 if args.nneur >= 64 else 8
    model = RNNAutoreg(nx=nx_feat, nx_sfc=24, ny=6, ny_sfc=8,
                       nneur=(args.nneur, args.nneur),
                       nh_mem=nh_mem, add_pres=False, output_prune=False)
    n_val = max(args.chunk // 4, 32)
    chunk_T = 16 if not args.quick else 8
    rcfg = RolloutConfig(
        rollout_schedule={0: 1, 4: 2, 10: 4, 18: 8} if not args.quick
        else {0: 1, 2: 2},
        loss="huber", lr=args.lr, lr_schedule="step",
        lr_gamma=args.lr_gamma, decay_every=1200,
        w_water=args.w_water, w_energy=args.w_energy,
        semi_online=True, replay="mixed", remat=True,
        gradual_mixing_end_epoch=max(args.epochs // 2, 1),
        n_prog=6, pass_x_raw=False, seed=0)
    trainer = RolloutTrainer(
        model, rcfg, np.asarray(g.hyai), np.asarray(g.hybi),
        yscale_lev=yscale_lev.reshape(1, 1, 6), yscale_sca=yscale_sca,
        xmean_prog=xm_j[:6], xdiv_prog=xs_j[:6])

    T_tr = args.train_steps - n_val

    # group S time-chunks along the batch axis: each update trains
    # S*384 = 3072 columns (the chip's throughput sweet spot,
    # PERFORMANCE.md) instead of being latency-bound at B=384; every
    # concatenated column still sees a time-contiguous window, so the
    # autoregressive memory threading is unchanged
    S_GROUP = 1 if args.quick else 4

    def chunks(lo, hi, seed, shuffle=True):
        rng = np.random.default_rng(seed)
        buf = []
        for idx in chunkize(hi - lo, chunk_T, rng, shuffle):
            sl = idx + lo
            buf.append({"x_lev": x_lev_n[sl], "x_sfc": x_sfc_n[sl],
                        "y_lev": y_lev_n[sl], "y_sfc": y_sfc_n[sl],
                        "sp": sp_t[sl],
                        "x_lev_raw": x_raw[sl], "y_lev_raw": y_raw[sl]})
            if len(buf) == S_GROUP:
                yield {k: jnp.concatenate([b[k] for b in buf], axis=1)
                       for k in buf[0]}
                buf = []
        if buf:
            yield {k: jnp.concatenate([b[k] for b in buf], axis=1)
                   for k in buf[0]}

    params, opt_state, mem = trainer.init(
        jax.random.PRNGKey(0), next(iter(chunks(0, chunk_T, 0, False))))
    history = []
    from flax import serialization
    if args.load_emulator:
        with open(args.load_emulator, "rb") as f:
            params = serialization.from_bytes(params, f.read())
        print(f"[{time.time()-t_wall0:7.1f}s] loaded emulator from "
              f"{args.load_emulator} (training skipped)", flush=True)
    else:
        for ep in range(args.epochs):
            params, opt_state, mem, rec = trainer.run_epoch(
                params, opt_state, mem, chunks(0, T_tr, ep), ep)
            _, _, mem, vrec = trainer.run_epoch(
                params, opt_state, mem,
                chunks(T_tr, args.train_steps, 0, False), ep, train=False)
            rec["val_loss"] = vrec["loss"]
            history.append(rec)
            print(f"[{time.time()-t_wall0:7.1f}s] epoch {ep:3d} "
                  f"W={rec['window']} loss={rec['loss']:.4f} "
                  f"val={vrec['loss']:.4f}", flush=True)

        with open(args.out + "_emulator.msgpack", "wb") as f:
            f.write(serialization.to_bytes(params))

    # -------------- deployed emulator (normalize -> clip -> NN -> unscale
    # -> envelope restoring), parameterizable for the on-policy loop
    def emulator(x_main_raw, x_sfc_raw, mem, _prm=None):
        feats = jnp.concatenate([x_main_raw, derived(x_main_raw)], axis=-1)
        xn = jnp.clip((feats - xm_j) / xs_j, xlo, xhi)
        sn = jnp.clip((x_sfc_raw - sfm_j) / sfs_j, slo, shi)
        out, out_sfc, mem = model.apply(
            params if _prm is None else _prm, xn, sn, mem)
        out = out / yscale_lev
        if tau_env_s > 0:
            # state-space envelope restoring: relax out-of-envelope T
            # toward the per-level training envelope (see --env-restore-tau)
            T = x_main_raw[..., 0]
            out = out.at[..., 0].add(
                (jnp.clip(T, Tenv_lo, Tenv_hi) - T) / tau_env_s)
        if tau_qenv_s > 0:
            qv = x_main_raw[..., 1]
            out = out.at[..., 1].add(
                (jnp.clip(qv, Qenv_lo, Qenv_hi) - qv) / tau_qenv_s)
        if tau_cenv_s > 0:
            # WATER-NEUTRAL condensate envelope restoring: spurious
            # out-of-envelope cloud EVAPORATES into qv rather than being
            # annihilated. The clamp is a sustained flux (the NN keeps
            # regenerating the pockets), so annihilation drains the
            # water equilibrium ~6-20% (diag_r5_qcfast/cfgC); the
            # transfer keeps the budget closed.
            qc_s = x_main_raw[..., 2]
            qi_s = x_main_raw[..., 3]
            exc_c = (qc_s - jnp.minimum(qc_s, QCenv_hi)) / tau_cenv_s
            exc_i = (qi_s - jnp.minimum(qi_s, QIenv_hi)) / tau_cenv_s
            out = out.at[..., 2].add(-exc_c)
            out = out.at[..., 3].add(-exc_i)
            out = out.at[..., 1].add(exc_c + exc_i)
        if tau_rhenv_s > 0:
            qv_s = x_main_raw[..., 1]
            qv_cap = RHenv_hi * thermo.qsat(x_main_raw[..., 0], pmid)
            out = out.at[..., 1].add(
                (jnp.minimum(qv_s, qv_cap) - qv_s) / tau_rhenv_s)
        out_sfc = out_sfc / yscale_sca
        if args.precc_consistency:
            # physically-consistent precip diagnostic: P = E - d/dt(column
            # water) per column, with E the host-known surface-evaporation
            # flux (LHFLX-driven, the same boundary closure the truth
            # physics uses — ClimSim's LHFLX is likewise a host-model
            # input, pbuf_LHFLX). Replaces the NN's free-standing precc
            # channel, which carries no budget constraint.
            qs_l = thermo.qsat(x_main_raw[..., 0], pmid)
            nb = 5
            maskb = jnp.zeros((nlev,), jnp.float32).at[-nb:].set(1.0)
            dpg = g.mass_weights(x_sfc_raw[:, 0])           # dp/g [B,L]
            mcol = jnp.sum(dpg * maskb, axis=1, keepdims=True)
            dry = jnp.clip(1.0 - x_main_raw[..., 1]
                           / jnp.maximum(qs_l, 1e-8), 0.0, 1.0)
            e_col = jnp.sum(dpg * maskb * dry, axis=1) \
                * x_sfc_raw[:, 3] / (C.LV * mcol[:, 0])     # kg m-2 s-1
            sink = e_col - jnp.sum(
                dpg * (out[..., 1] + out[..., 2] + out[..., 3]), axis=1)
            precc_c = jnp.clip(sink / C.RHO_H2O, 0.0, None)
            snowf = thermo.snow_fraction(x_main_raw[:, -1, 0])
            out_sfc = out_sfc.at[:, 3].set(precc_c)
            out_sfc = out_sfc.at[:, 2].set(precc_c * snowf)
        return out, out_sfc, mem

    model_loop = HybridLoop(emulator, g, loop_cfg)
    mem0 = jnp.zeros((ncol, nlev, nh_mem), jnp.float32)

    FIELDS = ("T", "qv", "qc", "qi", "u", "v")

    # area-weighted column-scalar mean + the truth physics' evaporation
    # closure evaluated at an arbitrary state (round-5 precip mechanism
    # diagnostics; mirrors data/synthetic.py::equilibrium_physics step 4)
    aw_j = jnp.asarray(np.asarray(g.area_wgt)[:ncol], jnp.float32)
    awn_j = aw_j / jnp.sum(aw_j)
    cmean = lambda f: jnp.sum(awn_j * f)
    _dpg_cols = g.mass_weights(base_sfc[:, 0])
    _maskb = jnp.zeros((nlev,), jnp.float32).at[-5:].set(1.0)
    _mcolb = jnp.sum(_dpg_cols * _maskb, axis=1)

    def _evap_col(st):
        qs_ = thermo.qsat(st["T"], pmid)
        dry = jnp.clip(1.0 - st["qv"] / jnp.maximum(qs_, 1e-8), 0.0, 1.0)
        return jnp.sum(_dpg_cols * _maskb * dry, axis=1) \
            * base_sfc[:, 3] / (C.LV * _mcolb)          # kg m-2 s-1

    def _precc_parts(st):
        """Decompose the truth physics' precip at a state into its three
        sources (data/synthetic.py::equilibrium_physics step 2-3):
        fresh-condensation rain (rain_eff x cond), liquid autoconversion
        (qc/tau), ice autoconversion (qi/tau) — column-integrated,
        area-meaned [kg m-2 s-1]. Shows WHICH state field drives the
        hybrid's precip excess (B_statedist in prec_decomposition)."""
        qs_ = thermo.qsat(st["T"], pmid)
        fliq = thermo.liquid_fraction(st["T"])
        L_eff = C.LV * fliq + C.LSUB * (1.0 - fliq)
        gamma = 1.0 + L_eff ** 2 * qs_ / (C.CP * C.RV * st["T"] ** 2)
        cond = jnp.maximum(st["qv"] - eq_cfg.rh_cond * qs_, 0.0) \
            / (eq_cfg.tau_cond * gamma)
        col = lambda f: cmean(jnp.sum(_dpg_cols * f, axis=1))
        return (col(eq_cfg.rain_eff * cond),
                col(st["qc"] / eq_cfg.tau_auto_liq),
                col(st["qi"] / eq_cfg.tau_auto_ice))

    # -------------- on-policy (hybrid-state) fine-tuning: the round-5
    # mechanistic lever for the precip/zonal-bias targets. The 1-year
    # decomposition (diag_r5_1yr.json) shows the precip excess is a
    # STATE-DISTRIBUTION effect (truth physics at hybrid-visited states
    # rains 1.67x the truth climate; the NN's own precc channel actually
    # UNDERSHOOTS at-state, A=0.84) — the hybrid drifts into a warmer,
    # BL-drier climate whose evaporation closure pumps more water. The
    # fix: collect trajectories of the CURRENT hybrid and label every
    # visited state with the truth physics' tendencies, then fine-tune
    # on the mixture of original + on-policy data (DAgger-style; the
    # reference's semi-online training, rnn/utils.py:994-1060, is the
    # same idea applied within the training distribution).
    if args.onpolicy_rounds > 0:
        # fine-tuning optimizer: same algorithm, lower LR (the initial
        # training may have been loaded from msgpack — the fresh opt
        # state must not relearn at the full 2e-3)
        import dataclasses as _dc
        ft_cfg = _dc.replace(rcfg, lr=args.onpolicy_lr)
        trainer_ft = RolloutTrainer(
            model, ft_cfg, np.asarray(g.hyai), np.asarray(g.hybi),
            yscale_lev=yscale_lev.reshape(1, 1, 6), yscale_sca=yscale_sca,
            xmean_prog=xm_j[:6], xdiv_prog=xs_j[:6])
        opt_state_ft = trainer_ft.tx.init(params)

        @jax.jit
        def opo_chunk(prm, st, m, t0):
            em = lambda xr, sf, mm: emulator(xr, sf, mm, _prm=prm)
            lp = HybridLoop(em, g, loop_cfg)

            def step(carry, dt_i):
                st, m = carry
                sfc = sfc_at(t0 + dt_i)
                x_raw = jnp.stack([st[k] for k in FIELDS], axis=-1)
                yt, ysfc_t = truth(x_raw, sfc, dummy_mem)[:2]
                st, m, _ = lp.coupled_step(st, m, sfc)
                return (st, m), (x_raw, yt, ysfc_t, sfc)
            (st, m), outs = jax.lax.scan(step, (st, m),
                                         jnp.arange(160 if not args.quick
                                                    else 48))
            return st, m, outs

        src_orig = {"x_lev": x_lev_n, "x_sfc": x_sfc_n, "y_lev": y_lev_n,
                    "y_sfc": y_sfc_n, "sp": sp_t,
                    "x_lev_raw": x_raw, "y_lev_raw": y_raw}
        ep_next = args.epochs
        for rd in range(args.onpolicy_rounds):
            # 1. run the CURRENT hybrid from the attractor state,
            # recording states + truth-physics labels
            st_o = {k: v for k, v in state.items()}
            mem_o = jnp.zeros((ncol, nlev, nh_mem), jnp.float32)
            xs_o, ys_o, ysfc_o, sfc_o = [], [], [], []
            t_o = run_t0 + 100000 + rd * (args.onpolicy_steps
                                          + args.onpolicy_spin)
            spun = 0
            spin_n = args.onpolicy_spin if not args.quick else 0
            while spun < spin_n:
                st_o, mem_o, _ = opo_chunk(params, st_o, mem_o,
                                           jnp.int32(t_o + spun))
                spun += 160
            t_o += spun
            got = 0
            while got < args.onpolicy_steps:
                st_o, mem_o, (xr, yr, ysf, sf) = opo_chunk(
                    params, st_o, mem_o, jnp.int32(t_o + got))
                xs_o.append(xr); ys_o.append(yr)
                ysfc_o.append(ysf); sfc_o.append(sf)
                got += xr.shape[0]
            xo_raw = jnp.concatenate(xs_o)[:args.onpolicy_steps]
            yo_raw = jnp.concatenate(ys_o)[:args.onpolicy_steps]
            yso_raw = jnp.concatenate(ysfc_o)[:args.onpolicy_steps]
            sfo = jnp.concatenate(sfc_o)[:args.onpolicy_steps]
            feats_o = jnp.concatenate([xo_raw, derived(xo_raw)], axis=-1)
            src_opo = {
                "x_lev": jnp.clip((feats_o - xm_j) / xs_j, xlo, xhi)
                .astype(jnp.float32),
                "x_sfc": jnp.clip((sfo - sfm_j) / sfs_j, slo, shi)
                .astype(jnp.float32),
                "y_lev": (yo_raw * yscale_lev).astype(jnp.float32),
                "y_sfc": (yso_raw * yscale_sca).astype(jnp.float32),
                "sp": jnp.broadcast_to(base_sfc[:, 0][None],
                                       sfo.shape[:2]),
                "x_lev_raw": xo_raw, "y_lev_raw": yo_raw}

            # 2. fine-tune on the original + on-policy mixture
            def chunks_mix(seed):
                rng = np.random.default_rng(seed)
                descs = []
                for si, src in ((0, src_orig), (1, src_opo)):
                    T_s = src["x_lev"].shape[0]
                    for idx in chunkize(T_s, chunk_T, rng, True):
                        descs.append((si, idx))
                order = rng.permutation(len(descs))
                buf = []
                for oi in order:
                    si, idx = descs[oi]
                    src = (src_orig, src_opo)[si]
                    buf.append({k: src[k][idx] for k in src})
                    if len(buf) == S_GROUP:
                        yield {k: jnp.concatenate([b[k] for b in buf],
                                                  axis=1)
                               for k in buf[0]}
                        buf = []
                if buf:
                    yield {k: jnp.concatenate([b[k] for b in buf],
                                              axis=1) for k in buf[0]}

            for k_ep in range(args.onpolicy_epochs):
                params, opt_state_ft, mem, rec = trainer_ft.run_epoch(
                    params, opt_state_ft, mem, chunks_mix(1000 + ep_next),
                    ep_next)
                _, _, mem, vrec = trainer_ft.run_epoch(
                    params, opt_state_ft, mem,
                    chunks(T_tr, args.train_steps, 0, False), ep_next,
                    train=False)
                rec["val_loss"] = vrec["loss"]
                rec["onpolicy_round"] = rd
                history.append(rec)
                ep_next += 1
                if k_ep % 5 == 0 or k_ep == args.onpolicy_epochs - 1:
                    print(f"[{time.time()-t_wall0:7.1f}s] onpolicy rd "
                          f"{rd} ep {ep_next - 1} W={rec['window']} "
                          f"loss={rec['loss']:.4f} "
                          f"val={vrec['loss']:.4f}", flush=True)
        with open(args.out + "_emulator.msgpack", "wb") as f:
            f.write(serialization.to_bytes(params))
        print(f"[{time.time()-t_wall0:7.1f}s] onpolicy fine-tuning done "
              f"({args.onpolicy_rounds} rounds x "
              f"{args.onpolicy_steps} steps)", flush=True)

    # ------- offline scoreboard: teacher-forced one-step predictions on
    # the held-out validation segment, scored with the reference's
    # ~40-metric epoch scoreboard (train/epoch_metrics.py; the online run
    # below collects the matching online table)
    offline_metrics = None
    if not args.skip_scoreboard:
        from climsim_tpu.train.epoch_metrics import epoch_metrics
        v0, v1 = T_tr, args.train_steps
        mem_off = jnp.zeros((ncol, nlev, nh_mem), jnp.float32)

        @jax.jit
        def offline_preds(xl, xsf):
            def ostep(memc, inp):
                xn, sn = inp
                out, out_sfc, memc = model.apply(params, xn, sn, memc)
                return memc, (out, out_sfc)
            _, (pl, psf) = jax.lax.scan(ostep, mem_off, (xl, xsf))
            return pl / yscale_lev, psf / yscale_sca

        pl, psf = offline_preds(x_lev_n[v0:v1], x_sfc_n[v0:v1])
        skip = min(8, max(v1 - v0 - 1, 0))     # memory spin-up steps
        flat = lambda a: np.asarray(a[skip:]).reshape((-1,) + a.shape[2:])
        offline_metrics = epoch_metrics(
            flat(pl), flat(psf), flat(y_raw[v0:v1]),
            flat(y_sfc_raw[v0:v1]),
            np.asarray(sp_t[v0:v1][skip:]).ravel(),
            np.asarray(g.hyai), np.asarray(g.hybi))
        print(f"[{time.time()-t_wall0:7.1f}s] offline scoreboard: "
              f"R2_dT={offline_metrics['R2_dT']:.3f} "
              f"R2_dqv={offline_metrics['R2_dqv']:.3f} "
              f"r2_lev_mean={offline_metrics['r2_lev_mean']:.3f}",
              flush=True)

    # ------------------------------------------------ 3. the long paired run
    @jax.jit
    def paired_chunk(st_m, mem_m, st_t, t0):
        def step(carry, dt_i):
            st_m, mem_m, st_t = carry
            sfc = sfc_at(t0 + dt_i)
            st_m, mem_m, dg_m = model_loop.coupled_step(st_m, mem_m, sfc)
            st_t, _, dg_t = truth_loop.coupled_step(st_t, dummy_mem, sfc)
            d = {
                "T_m": wmean(st_m["T"]), "T_t": wmean(st_t["T"]),
                "qv_m": wmean(st_m["qv"]), "qv_t": wmean(st_t["qv"]),
                "water_m": jnp.sum(w_phys * (st_m["qv"] + st_m["qc"]
                                             + st_m["qi"])),
                "water_t": jnp.sum(w_phys * (st_t["qv"] + st_t["qc"]
                                             + st_t["qi"])),
                "Tmin_m": st_m["T"].min(), "Tmax_m": st_m["T"].max(),
                # location of the global T minimum (round-3 VERDICT:
                # disclose WHERE/WHEN the cold extreme lives)
                "Tmin_col": jnp.argmin(st_m["T"]) // nlev,
                "Tmin_lev": jnp.argmin(st_m["T"]) % nlev,
                "Tmin_t": st_t["T"].min(),
                "umax_m": jnp.abs(st_m["u"]).max(),
                "prec_m": wmean(dg_m["precc"][:, None] *
                                jnp.ones((1, nlev))),
                "prec_t": wmean(dg_t["precc"][:, None] *
                                jnp.ones((1, nlev))),
                "prec999_m": jnp.percentile(dg_m["precc"], 99.9),
                "prec999_t": jnp.percentile(dg_t["precc"], 99.9),
                "rmse_T": jnp.sqrt(wmean((st_m["T"] - st_t["T"]) ** 2)),
                "rmse_qv": jnp.sqrt(wmean((st_m["qv"] - st_t["qv"]) ** 2)),
                # global moist-energy integrals + per-step emulator/truth
                # physics energy residuals (reference rnn/metrics.py:197)
                "energy_m": dg_m["energy_int"],
                "energy_t": dg_t["energy_int"],
                "eresid_m": dg_m["energy_resid"],
                "eresid_t": dg_t["energy_resid"],
                # envelope-restoring work diagnostics (VERDICT r4 item 5):
                # fraction of grid points outside the T envelope and the
                # mean |dT| the restoring term injects [K/day]
                "env_frac": jnp.mean(
                    ((st_m["T"] < Tenv_lo) | (st_m["T"] > Tenv_hi))
                    .astype(jnp.float32)),
                "env_dT_Kday": jnp.mean(jnp.abs(
                    jnp.clip(st_m["T"], Tenv_lo, Tenv_hi) - st_m["T"]))
                * (86400.0 / tau_env_s if tau_env_s > 0 else 0.0),
                # evaporation-mechanism diagnostics (round-5): the truth
                # physics' surface evaporation scales with BL
                # subsaturation, E ~ LHFLX/Lv * (1 - qv/qsat(T)), so a
                # warm/dry hybrid BL drives more evap -> more precip in
                # equilibrium. Evaluate the SAME closure at both states.
                "evap_m": cmean(_evap_col(st_m)),
                "evap_t": cmean(_evap_col(st_t)),
                "rhbl_m": cmean(jnp.mean(
                    st_m["qv"][:, -5:] / jnp.maximum(
                        thermo.qsat(st_m["T"][:, -5:], pmid[:, -5:]),
                        1e-8), axis=1)),
                "rhbl_t": cmean(jnp.mean(
                    st_t["qv"][:, -5:] / jnp.maximum(
                        thermo.qsat(st_t["T"][:, -5:], pmid[:, -5:]),
                        1e-8), axis=1)),
            }
            # budget-implied (physical) precip of the hybrid: P = E -
            # d/dt(column water) from the EMULATOR'S own tendencies —
            # the identity the truth's precc satisfies by construction.
            # The NN's free-standing precc channel is a biased sensor of
            # this (A_atstate_ratio); the budget-implied rate is what
            # actually leaves the hybrid's water cycle.
            x_end = jnp.stack([st_m[k] for k in FIELDS], axis=-1)
            pt_e, _, _ = emulator(x_end, sfc_at(t0 + dt_i), mem_m)
            d["prec_cons_m"] = cmean(
                _evap_col(st_m) - jnp.sum(
                    _dpg_cols * (pt_e[..., 1] + pt_e[..., 2]
                                 + pt_e[..., 3]), axis=1)) / C.RHO_H2O
            for tag, stx in (("m", st_m), ("t", st_t)):
                pc_c, pc_al, pc_ai = _precc_parts(stx)
                d[f"pcond_{tag}"] = pc_c
                d[f"pautoc_{tag}"] = pc_al
                d[f"pautoi_{tag}"] = pc_ai
                d[f"qcint_{tag}"] = cmean(jnp.sum(_dpg_cols * stx["qc"],
                                                  axis=1))
                d[f"qiint_{tag}"] = cmean(jnp.sum(_dpg_cols * stx["qi"],
                                                  axis=1))
            return (st_m, mem_m, st_t), (d, dg_m["precc"], dg_t["precc"])
        carry, (d, pcol_m, pcol_t) = jax.lax.scan(
            step, (st_m, mem_m, st_t), jnp.arange(args.chunk))
        st_m, mem_m, st_t = carry
        # chunk-mean fields for zonal/column statistics
        means = {"T_m": st_m["T"], "T_t": st_t["T"],
                 "prec_m_col": pcol_m.mean(axis=0),
                 "prec_t_col": pcol_t.mean(axis=0)}
        # ONLINE tendency sampling at the chunk-end state: the emulator's
        # prediction vs the truth physics evaluated AT THE SAME (hybrid)
        # state — accumulated over the run this yields the online
        # scoreboard that isolates emulator skill from trajectory
        # divergence (the online/offline R2 comparison of the north star)
        sfc_end = sfc_at(t0 + args.chunk)
        x_raw_end = jnp.stack([st_m[k] for k in FIELDS], axis=-1)
        pt_m, ptsfc_m, _ = emulator(x_raw_end, sfc_end, mem_m)
        pt_t, ptsfc_t = truth(x_raw_end, sfc_end, dummy_mem)[:2]
        samp = (pt_m, ptsfc_m, pt_t, ptsfc_t)
        return st_m, mem_m, st_t, d, means, samp

    st_m = {k: v for k, v in state.items()}
    st_t = {k: v for k, v in state.items()}
    mem_m = mem0
    jsonl = open(args.out + ".jsonl", "w")
    n_chunks = args.steps // args.chunk
    per_step = {}
    last_T_m = last_T_t = None
    prec_col_sum = {"m": np.zeros(ncol), "t": np.zeros(ncol)}
    print(f"[{time.time()-t_wall0:7.1f}s] long run: {args.steps} steps "
          f"({args.steps * C.DT_STEP / 86400 / 365:.2f} sim years)",
          flush=True)
    online_samples = []
    for ci in range(n_chunks):
        st_m, mem_m, st_t, d, means, samp = paired_chunk(
            st_m, mem_m, st_t, jnp.int32(run_t0 + ci * args.chunk))
        online_samples.append(tuple(np.asarray(s) for s in samp))
        d = {k: np.asarray(v) for k, v in d.items()}
        bad = not np.isfinite(d["T_m"]).all()
        rec = {"chunk": ci, "step_end": (ci + 1) * args.chunk,
               "sim_days": round((ci + 1) * args.chunk * C.DT_STEP / 86400,
                                 2)}
        for k, v in d.items():
            rec[k + "_last"] = float(v[-1])
            rec[k + "_mean"] = float(v.mean())
        jsonl.write(json.dumps(rec) + "\n")
        jsonl.flush()
        # full-resolution error-growth series for the first ~month + a
        # subsampled tail
        for k, v in d.items():
            per_step.setdefault(k, []).append(
                v if ci * args.chunk < 2400 else v[::24])
        last_T_m, last_T_t = np.asarray(means["T_m"]), np.asarray(
            means["T_t"])
        prec_col_sum["m"] += np.asarray(means["prec_m_col"], np.float64)
        prec_col_sum["t"] += np.asarray(means["prec_t_col"], np.float64)
        if ci % max(n_chunks // 10, 1) == 0 or bad:
            print(f"[{time.time()-t_wall0:7.1f}s] day "
                  f"{rec['sim_days']:7.1f}: <T>m={rec['T_m_last']:.2f} "
                  f"<T>t={rec['T_t_last']:.2f} rmseT={rec['rmse_T_last']:.3f} "
                  f"prec m/t={rec['prec_m_last']/max(rec['prec_t_last'],1e-30):.3f}",
                  flush=True)
        if bad:
            print("NaN detected — stopping early", flush=True)
            break
    jsonl.close()

    # ------- cross-protocol scoreboard: 2x2 {state distribution} x
    # {memory protocol}. Round-3 VERDICT weak #4: the offline scoreboard
    # (teacher-forced on truth-trajectory states) and the online one
    # (at-state on hybrid-visited states) sample DIFFERENT state
    # distributions, so their agreement is not apples-to-apples. Here the
    # SAME one-step scoring protocol runs on two contiguous recorded
    # trajectories — a truth continuation and a hybrid continuation —
    # each scored twice: memory threaded from a cold start ("tf", the
    # offline protocol) and from the long run's carried memory
    # ("online_mem"). Reference scoreboard semantics rnn/utils.py:1413-1766.
    xp_summary = None
    xp_full = None
    if args.xprotocol_steps > 0 and not args.skip_scoreboard \
            and online_samples:
        from climsim_tpu.train.epoch_metrics import epoch_metrics
        XP = args.xprotocol_steps
        t_end = run_t0 + (ci + 1) * args.chunk

        def record_traj(loop_obj, st, mem_init):
            @jax.jit
            def rec(st, m, tt0):
                def step(carry, dt_i):
                    st, m = carry
                    sfc = sfc_at(tt0 + dt_i)
                    xr = jnp.stack([st[k] for k in FIELDS], axis=-1)
                    ptt, ptsfct = truth(xr, sfc, dummy_mem)[:2]
                    st, m, _ = loop_obj.coupled_step(st, m, sfc)
                    return (st, m), (xr, sfc, ptt, ptsfct)
                (st, m), outs = jax.lax.scan(step, (st, m),
                                             jnp.arange(XP))
                return outs
            return rec(st, mem_init, jnp.int32(t_end))

        def score_traj(outs, mem0, skip):
            xr, sfc_s, ptt, ptsfct = outs
            feats = jnp.concatenate([xr, derived(xr)], axis=-1)
            xn = jnp.clip((feats - xm_j) / xs_j, xlo, xhi)
            sn = jnp.clip((sfc_s - sfm_j) / sfs_j, slo, shi)

            @jax.jit
            def preds(xn, sn, m0):
                def ostep(m, inp):
                    out, out_sfc, m = model.apply(params, inp[0], inp[1], m)
                    return m, (out, out_sfc)
                _, (pl, psf) = jax.lax.scan(ostep, m0, (xn, sn))
                return pl / yscale_lev, psf / yscale_sca

            pl, psf = preds(xn, sn, m0=mem0)
            flat = lambda a: np.asarray(a[skip:]).reshape(
                (-1,) + a.shape[2:])
            return epoch_metrics(
                flat(pl), flat(psf), flat(ptt), flat(ptsfct),
                np.tile(np.asarray(base_sfc[:, 0]), XP - skip),
                np.asarray(g.hyai), np.asarray(g.hybi))

        outs_t = record_traj(truth_loop, st_t, dummy_mem)
        outs_m = record_traj(model_loop, st_m, mem_m)
        skip_tf = min(8, XP - 1)
        cells = {
            "truth_states": {
                "tf": score_traj(outs_t, mem0, skip_tf),
                "online_mem": score_traj(outs_t, mem_m, 0)},
            "hybrid_states": {
                "tf": score_traj(outs_m, mem0, skip_tf),
                "online_mem": score_traj(outs_m, mem_m, 0)},
        }
        KEYS = ["R2_dT", "R2_dqv", "R2_dqliq", "R2_dqice", "R2_du",
                "R2_dv", "R2_NETSW", "R2_FLWDS", "R2_PRECSC", "R2_PRECC",
                "r2_lev_mean"]
        xp_summary = {
            s: {p: {k: round(float(m[k]), 4) for k in KEYS if k in m}
                for p, m in d.items()} for s, d in cells.items()}
        xp_full = {s: {p: {k: (v if not isinstance(v, np.ndarray)
                               else v.tolist())
                           for k, v in m.items()}
                       for p, m in d.items()} for s, d in cells.items()}
        print("cross-protocol R2 (states x memory):",
              json.dumps(xp_summary), flush=True)
        try:     # per-level R2 profile figure for the 2x2 cells
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            fig2, axes2 = plt.subplots(1, 3, figsize=(13, 4.5),
                                       sharey=True)
            for j, ch in enumerate([0, 1, 2]):
                ax = axes2[j]
                for st, color in (("truth_states", "tab:blue"),
                                  ("hybrid_states", "tab:red")):
                    for p, ls in (("tf", "-"), ("online_mem", ":")):
                        r2 = np.array(cells[st][p]["r2_lev"])[:, ch]
                        ax.plot(r2, np.arange(len(r2)), ls, color=color,
                                label=f"{st.split('_')[0]} / {p}"
                                if j == 0 else None,
                                lw=1.5 if ls == "-" else 2.0, alpha=0.9)
                ax.set_title("per-level R2: "
                             + ["dT", "dqv", "dqliq"][j])
                ax.set_xlabel("R2")
                ax.set_xlim(-0.1, 1.0)
                ax.axvline(0, color="k", lw=0.5)
            axes2[0].set_ylabel("model level (0 = TOA)")
            axes2[0].invert_yaxis()
            axes2[0].legend(loc="lower left", fontsize=8)
            fig2.tight_layout()
            fig2.savefig(args.out + "_xprotocol_profile.png", dpi=110)
        except Exception as e:
            print(f"(no xprotocol plot: {e})", flush=True)

    # ------------------------------------------------------------ 4. report
    series = {k: np.concatenate(v) for k, v in per_step.items()}

    # online scoreboard over the chunk-end tendency samples
    online_metrics = None
    online_vs_offline = None
    if online_samples and not args.skip_scoreboard:
        from climsim_tpu.train.epoch_metrics import epoch_metrics
        cat = lambda i: np.concatenate([s[i] for s in online_samples])
        sp_on = np.tile(np.asarray(base_sfc[:, 0]), len(online_samples))
        online_metrics = epoch_metrics(cat(0), cat(1), cat(2), cat(3),
                                       sp_on, np.asarray(g.hyai),
                                       np.asarray(g.hybi))
        if offline_metrics is not None:
            keys = ["R2_dT", "R2_dqv", "R2_dqliq", "R2_dqice", "R2_du",
                    "R2_dv", "R2_NETSW", "R2_FLWDS", "R2_PRECSC",
                    "R2_PRECC", "r2_lev_mean"]
            online_vs_offline = {
                k: {"offline": round(float(offline_metrics[k]), 4),
                    "online": round(float(online_metrics[k]), 4)}
                for k in keys if k in offline_metrics
                and k in online_metrics}
            print("online vs offline R2:", json.dumps(online_vs_offline),
                  flush=True)
    zonal_bands = np.linspace(-90, 90, 17)
    bidx = np.digitize(lat, zonal_bands) - 1
    zbias = np.array([
        (last_T_m - last_T_t)[bidx == b].mean() if np.any(bidx == b)
        else np.nan for b in range(16)])

    # ---- precip-excess decomposition (round-4 VERDICT item 1d): WHERE the
    # excess falls (zonal profile of the run-mean per-column precip) and
    # at-state vs state-distribution attribution from the chunk-end
    # samples: ratio_total = A x B with
    #   A = <precc_NN at hybrid states> / <precc_truthphys at hybrid states>
    #       (emulator amplitude bias at the states it visits)
    #   B = <precc_truthphys at hybrid states> / <precc_truth run>
    #       (the hybrid visiting rainier/drier states than the truth)
    aw_col = np.asarray(g.area_wgt)[:ncol]
    pm_col = prec_col_sum["m"] / max(ci + 1, 1)
    pt_col = prec_col_sum["t"] / max(ci + 1, 1)
    zprec_m = np.array([np.sum((aw_col * pm_col)[bidx == b])
                        / max(np.sum(aw_col[bidx == b]), 1e-30)
                        if np.any(bidx == b) else np.nan
                        for b in range(16)])
    zprec_t = np.array([np.sum((aw_col * pt_col)[bidx == b])
                        / max(np.sum(aw_col[bidx == b]), 1e-30)
                        if np.any(bidx == b) else np.nan
                        for b in range(16)])
    prec_decomp = None
    if online_samples:
        awn = aw_col / aw_col.sum()
        nn_at_h = float(np.mean([np.sum(awn * s[1][:, 3])
                                 for s in online_samples]))
        tp_at_h = float(np.mean([np.sum(awn * s[3][:, 3])
                                 for s in online_samples]))
        truth_run = float(np.sum(awn * pt_col))
        prec_decomp = {
            "precc_NN_at_hybrid": nn_at_h,
            "precc_truthphys_at_hybrid": tp_at_h,
            "precc_truth_run": truth_run,
            "A_atstate_ratio": round(nn_at_h / max(tp_at_h, 1e-30), 4),
            "B_statedist_ratio": round(tp_at_h / max(truth_run, 1e-30), 4),
        }

    days = np.arange(len(series["T_m"])) * np.nan  # display only
    summary = {
        "steps_run": int(min(args.steps, (ci + 1) * args.chunk)),
        "sim_years": round((ci + 1) * args.chunk * C.DT_STEP / 86400 / 365,
                           3),
        "finite": bool(np.isfinite(series["T_m"]).all()),
        "T_drift_K": float(series["T_m"][-1] - series["T_t"][-1]),
        "T_rmse_final_K": float(series["rmse_T"][-1]),
        "T_rmse_day1_K": float(series["rmse_T"][:72].max()),
        "qv_rmse_final": float(series["rmse_qv"][-1]),
        "water_ratio_final": float(series["water_m"][-1]
                                   / series["water_t"][-1]),
        "prec_mean_ratio": float(series["prec_m"].mean()
                                 / max(series["prec_t"].mean(), 1e-30)),
        # raw-tendency-implied precip (P = E - sum dp/g * NN dq): includes
        # the PHANTOM drying the >=0 state clips cancel (the NN's net
        # moisture tendency at trace states is strongly negative; the
        # clip backfills it), so it OVERCOUNTS — its excess over
        # prec_phys_ratio measures the rectification flux
        "prec_rawtend_ratio": float(series["prec_cons_m"].mean()
                                    / max(series["prec_t"].mean(), 1e-30))
        if "prec_cons_m" in series else None,
        # PHYSICAL throughput: at near-steady water, actual precip must
        # balance surface evaporation; P_phys = E - d/dt(column water)
        # from the measured state series (clip-consistent by definition)
        "prec_phys_ratio": (lambda: float(
            (np.mean(series["evap_m"])
             - (series["water_m"][-1] - series["water_m"][0])
             / ncol / (min(args.steps, (ci + 1) * args.chunk) * C.DT_STEP))
            / max(np.mean(series["evap_t"])
                  - (series["water_t"][-1] - series["water_t"][0])
                  / ncol / (min(args.steps, (ci + 1) * args.chunk)
                            * C.DT_STEP), 1e-30)))()
        if "evap_m" in series else None,
        "prec_p999_ratio": float(np.mean(series["prec999_m"])
                                 / max(np.mean(series["prec999_t"]), 1e-30)),
        "Tmax_overall": float(np.max(series["Tmax_m"])),
        "Tmin_overall": float(np.min(series["Tmin_m"])),
        "Tmin_truth_overall": float(np.min(series["Tmin_t"]))
        if "Tmin_t" in series else None,
        "zonal_bias_K": [None if np.isnan(b) else round(float(b), 3)
                         for b in zbias],
        "zonal_prec_ratio": [None if (np.isnan(r) or np.isnan(t) or t <= 0)
                             else round(float(r / t), 3)
                             for r, t in zip(zprec_m, zprec_t)],
        "zonal_prec_mmday": {
            "hybrid": [None if np.isnan(r) else round(float(r * 8.64e7), 3)
                       for r in zprec_m],
            "truth": [None if np.isnan(r) else round(float(r * 8.64e7), 3)
                      for r in zprec_t]},
        "prec_decomposition": prec_decomp,
        "evap_ratio": float(np.mean(series["evap_m"])
                            / max(np.mean(series["evap_t"]), 1e-30))
        if "evap_m" in series else None,
        "precc_parts": {
            k: {"hybrid": float(np.mean(series[f"{p}_m"])),
                "truth": float(np.mean(series[f"{p}_t"])),
                "ratio": round(float(np.mean(series[f"{p}_m"])
                                     / max(np.mean(series[f"{p}_t"]),
                                           1e-30)), 3)}
            for k, p in (("cond_rain", "pcond"), ("auto_liq", "pautoc"),
                         ("auto_ice", "pautoi"), ("qc_path", "qcint"),
                         ("qi_path", "qiint"))}
        if "pcond_m" in series else None,
        "rh_bl": {"hybrid": float(np.mean(series["rhbl_m"])),
                  "truth": float(np.mean(series["rhbl_t"]))}
        if "rhbl_m" in series else None,
        "env_restore": {
            "frac_outside_mean": float(np.mean(series["env_frac"]))
            if "env_frac" in series else None,
            "frac_outside_max": float(np.max(series["env_frac"]))
            if "env_frac" in series else None,
            "mean_abs_dT_Kday": float(np.mean(series["env_dT_Kday"]))
            if "env_dT_Kday" in series else None},
        "energy_ratio_final": float(series["energy_m"][-1]
                                    / series["energy_t"][-1])
        if "energy_m" in series else None,
        "eresid_m_mean_W_m2": float(np.mean(series["eresid_m"]))
        if "eresid_m" in series else None,
        "eresid_t_mean_W_m2": float(np.mean(series["eresid_t"]))
        if "eresid_t" in series else None,
        "train_final_loss": history[-1]["loss"] if history else None,
        "train_final_val": history[-1].get("val_loss") if history else None,
        "config": {"nneur": args.nneur, "train_steps": args.train_steps,
                   "epochs": args.epochs, "amp_max": args.amp_max,
                   "w_water": args.w_water, "w_energy": args.w_energy,
                   "lr": args.lr, "fix_energy": not args.no_fix_energy,
                   "lat_feature": use_lat,
                   "env_restore_tau_days": args.env_restore_tau,
                   "env_margin_K": args.env_margin,
                   "env_restore_qv_days": args.env_restore_qv,
                   "env_restore_qc_days": args.env_restore_qc,
                   "env_restore_rh_days": args.env_restore_rh,
                   "precc_consistency": args.precc_consistency,
                   "qv_perturb": args.qv_perturb},
        "wall_seconds": round(time.time() - t_wall0, 1),
    }
    # where/when the cold extreme lives (round-3 VERDICT weak #2)
    if "Tmin_col" in series:
        imin = int(np.argmin(series["Tmin_m"]))
        col = int(series["Tmin_col"][imin])
        summary["Tmin_location"] = {
            "col": col, "lev": int(series["Tmin_lev"][imin]),
            "lat_deg": round(float(lat[col]), 2),
            "lon_deg": round(float(lon[col]), 2),
            "modal_lev": int(np.bincount(
                series["Tmin_lev"].astype(int)).argmax()),
            "modal_lat_deg": round(float(np.median(
                lat[series["Tmin_col"].astype(int)])), 2),
        }
    if online_vs_offline is not None:
        summary["online_vs_offline_R2"] = online_vs_offline
    if xp_summary is not None:
        summary["xprotocol_R2"] = xp_summary
    with open(args.out + ".json", "w") as f:
        json.dump({"summary": summary, "train_history": history,
                   "offline_metrics": offline_metrics,
                   "online_metrics": online_metrics,
                   "xprotocol_metrics": xp_full}, f, indent=1)
    print(json.dumps(summary, indent=1), flush=True)

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, axes = plt.subplots(2, 3, figsize=(15, 7))
        x_d = np.linspace(0, summary["sim_years"] * 365,
                          len(series["T_m"]))
        ax = axes[0, 0]
        ax.plot(x_d, series["T_m"], label="hybrid (NN)", lw=0.8)
        ax.plot(x_d, series["T_t"], label="truth", lw=0.8)
        ax.set_xlabel("simulated day")
        ax.set_ylabel("global mean T [K]")
        ax.set_title("drift")
        ax.legend()
        ax = axes[0, 1]
        n1 = min(72 * 30, len(series["rmse_T"]))
        ax.semilogy(np.arange(n1) / 72.0, series["rmse_T"][:n1],
                    label="RMSE T [K]")
        ax.semilogy(np.arange(n1) / 72.0,
                    series["rmse_qv"][:n1] * 1e3, label="RMSE qv [g/kg]")
        ax.set_xlabel("simulated day")
        ax.set_title("error growth (first month)")
        ax.legend()
        ax = axes[1, 0]
        centers = 0.5 * (zonal_bands[:-1] + zonal_bands[1:])
        ax.plot(centers, zbias, marker="o")
        ax.axhline(0, ls=":")
        ax.set_xlabel("latitude")
        ax.set_ylabel("T bias [K]")
        ax.set_title("final-state zonal-mean T bias")
        ax = axes[1, 1]
        mmday = 8.64e7
        ax.plot(x_d, series["prec_m"] * mmday, label="hybrid", lw=0.8)
        ax.plot(x_d, series["prec_t"] * mmday, label="truth", lw=0.8)
        ax.set_xlabel("simulated day")
        ax.set_ylabel("global precip [mm/day]")
        ax.set_title("precipitation")
        ax.legend()
        if "energy_m" in series:
            ax = axes[0, 2]
            e0 = series["energy_t"][0]
            ax.plot(x_d, series["energy_m"] / e0, label="hybrid", lw=0.8)
            ax.plot(x_d, series["energy_t"] / e0, label="truth", lw=0.8)
            ax.set_xlabel("simulated day")
            ax.set_ylabel("global moist energy / E0")
            ax.set_title("energy integral")
            ax.legend()
            ax = axes[1, 2]
            ax.plot(x_d, series["eresid_m"], label="hybrid", lw=0.6,
                    alpha=0.8)
            ax.plot(x_d, series["eresid_t"], label="truth", lw=0.6,
                    alpha=0.8)
            ax.set_xlabel("simulated day")
            ax.set_ylabel("physics energy residual [W m$^{-2}$]")
            ax.set_title("column energy residual (ref. rnn/metrics.py)")
            ax.legend()
        fig.tight_layout()
        fig.savefig(args.out + ".png", dpi=110)
        print(f"wrote {args.out}.png", flush=True)
    except Exception as e:
        print(f"(no plot: {e})", flush=True)


if __name__ == "__main__":
    main()
