"""Rollout RNN trainer CLI — the hydra driver equivalent
(rnn/train_rnn_rollout_torchscript_hydra.py) for the memory BiGRU and the
physics-constrained emulator.

Usage:
    python -m climsim_tpu.cli.train_rollout conf/autoreg_gru.yaml \
        [model.nh_mem=32 rollout.replay=mixed optimizer.name=soap ...]
"""
from __future__ import annotations

import json
import sys

import numpy as np


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print(__doc__)
        return 1
    import jax
    import jax.numpy as jnp
    from .. import variables as V
    from ..grid import Grid
    from ..data import synthetic as S, keeplev_chunks, KeeplevReader
    from ..models.rnn import RNNAutoreg
    from ..train.config import load_config
    from ..train.rollout import RolloutTrainer, RolloutConfig

    cfg = load_config(argv[0], argv[1:])
    if cfg.get("platform"):
        # must precede the first backend use (e.g. 'cpu' for local smoke
        # runs; the sitecustomize hook otherwise pins the TPU tunnel)
        jax.config.update("jax_platforms", cfg["platform"])
    vset = V.get(cfg.get("vset", "v4_rnn"))
    grid = Grid.from_file(cfg.get(
        "grid_path", "/root/reference/grid_info/ClimSim_low-res_grid-info.nc"))
    tt = lambda a: tuple(float(x) for x in np.asarray(a))

    # ---- data: keeplev H5 if given, else synthetic
    dcfg = cfg.get("data", {})
    n_train_steps = None
    # out-of-core streaming (reference shared-memory cache analog,
    # rnn/utils.py:2033-2061): stats fit on a bounded sample; epochs read
    # time-contiguous chunks through a double-buffered background thread
    stream = bool(dcfg.get("stream", False))
    stream_read = stream_T = None
    if dcfg.get("h5_path"):
        B = dcfg.get("ncol", 384)

        def load(path, max_steps=None):
            r = KeeplevReader(path)
            T = r.n // B
            if max_steps is not None:
                T = min(T, max_steps)
                d = r.load_slice(0, T * B)
            else:
                d = r.load_all()
            resh = lambda a: a[:T * B].reshape((T, B) + a.shape[1:])
            return (resh(d["input_lev"]), resh(d["input_sca"]),
                    resh(d["output_lev"]), resh(d["output_sca"]))

        if stream:
            if dcfg.get("val_h5_path"):
                raise ValueError("data.stream does not support a separate "
                                 "val_h5_path; use val_frac over one store")
            reader = KeeplevReader(dcfg["h5_path"])
            stream_read = reader.load_slice
            stream_T = reader.n // B
            x_lev, x_sfc, y_lev, y_sfc = load(
                dcfg["h5_path"], int(dcfg.get("stats_steps", 64)))
        else:
            x_lev, x_sfc, y_lev, y_sfc = load(dcfg["h5_path"])
        if dcfg.get("val_h5_path"):
            # separate validation file (the reference's val_data_fname):
            # appended after the training steps so the existing
            # train/val slicing serves each file exactly
            n_train_steps = x_lev.shape[0]
            vx, vxs, vy, vys = load(dcfg["val_h5_path"])
            cat = lambda a, b: np.concatenate([a, b], axis=0)
            x_lev, x_sfc = cat(x_lev, vx), cat(x_sfc, vxs)
            y_lev, y_sfc = cat(y_lev, vy), cat(y_sfc, vys)
    else:
        x_lev, x_sfc, y_lev, y_sfc = S.make_timeseries(
            jax.random.PRNGKey(dcfg.get("seed", 0)),
            S.SyntheticConfig(vset_name=vset.name,
                              ncol=dcfg.get("ncol", 384)), grid,
            dcfg.get("steps", 24), flat=False)
        x_lev, x_sfc = np.asarray(x_lev), np.asarray(x_sfc)
        y_lev, y_sfc = np.asarray(y_lev), np.asarray(y_sfc)

    # input preprocessing chain (the reference generator_xy rewrites,
    # rnn/utils.py:2160-2250): snowhice fix, rh prune, rh->q, v4->v5
    # conversion, exp/sqrt cloud transforms, stratospheric q prune
    pp_keys = ("snowhice_fix", "rh_prune", "rh_input_to_q",
               "include_q_input", "v4_to_v5_inputs",
               "cld_inp_transformation", "qinput_prune",
               "qinput_prune_lev")
    pcfg = None
    lbd_qc = lbd_qi = lbd_qn = None
    if any(k in dcfg for k in pp_keys):
        from ..data.preprocess import (PreprocessConfig,
                                       preprocess_level_inputs)
        from ..data.normalization import fit_exp_lambdas, load_exp_lambdas
        pcfg = PreprocessConfig(**{k: dcfg[k] for k in pp_keys
                                   if k in dcfg})
        if pcfg.cld_inp_transformation == "exp":
            # lambda tables: load from reference txt when given, else fit
            # from the data (online_testing cloud_exponential_
            # transformation.ipynb procedure; for streams, fit on the
            # stats sample)
            if dcfg.get("lbd_qn_path"):
                lbd_qn = load_exp_lambdas(dcfg["lbd_qn_path"])
            if dcfg.get("lbd_qc_path"):
                lbd_qc = load_exp_lambdas(dcfg["lbd_qc_path"])
            if dcfg.get("lbd_qi_path"):
                lbd_qi = load_exp_lambdas(dcfg["lbd_qi_path"])
            if pcfg.v4_to_v5_inputs and lbd_qn is None:
                lbd_qn = fit_exp_lambdas(x_lev[..., 2] + x_lev[..., 3])
            if not pcfg.v4_to_v5_inputs:
                if lbd_qc is None:
                    lbd_qc = fit_exp_lambdas(x_lev[..., 2])
                if lbd_qi is None:
                    lbd_qi = fit_exp_lambdas(x_lev[..., 3])

    def prep_raw(xl, xs):
        """Input preprocessing chain shared by the in-memory path and the
        per-chunk stream transform; returns (x_lev, x_lev_raw, x_sfc)."""
        xr = xl
        if pcfg is not None:
            from ..data.preprocess import preprocess_level_inputs
            xl, xr, xs = preprocess_level_inputs(
                xl, xs, np.asarray(grid.hyam), np.asarray(grid.hybm),
                pcfg, lbd_qc=lbd_qc, lbd_qi=lbd_qi, lbd_qn=lbd_qn)
        if dcfg.get("remove_past_sfc_inputs"):
            # drop the pbuf_* previous-physics surface channels (reference
            # driver :433-437: indices 17-21 of the v4_rnn scalar block)
            keep = [i for i in range(xs.shape[-1])
                    if i not in (17, 18, 19, 20, 21)]
            xs = xs[..., keep]
        return xl, xr, xs

    x_lev, x_lev_raw_src, x_sfc = prep_raw(x_lev, x_sfc)

    # normalization: the REFERENCE norm-file chain when data.norm=reference
    # (per-var per-level mean/(max-min) from input_*_v4_pervar.nc +
    # output_scale_std_lowerthred_v5.nc assembled exactly as the
    # reference hydra driver (which loads that file unconditionally,
    # :137; override with data.norm_output_scale),
    # rnn/train_rnn_rollout_torchscript_hydra.py:323-456 — the shipped
    # coefficients pair with the exp cloud-lambda txts, whose transform IS
    # the cloud channels' normalization: the files carry mean 0 / div 1
    # there); otherwise fitted from the data statistics (per-level by
    # default, reference input_norm_per_level / output_norm_per_level)
    if dcfg.get("norm") == "reference":
        from ..data.normalization import (reference_level_normalizer,
                                          reference_norm_paths)
        nz = reference_level_normalizer(
            vset,
            dcfg.get("norm_input_mean"), dcfg.get("norm_input_max"),
            dcfg.get("norm_input_min"), dcfg.get("norm_output_scale"),
            snowhice_fix=bool(dcfg.get("snowhice_fix", True)),
            remove_past_sfc=bool(dcfg.get("remove_past_sfc_inputs",
                                          False)))
        # record WHICH norm files produced these coefficients: a
        # checkpoint trained under one output_scale decodes wrongly
        # under another, so the provenance must travel with it (ADVICE
        # r4). Logged always; persisted next to the checkpoint when one
        # is configured.
        norm_prov = reference_norm_paths(
            dcfg.get("norm_input_mean"), dcfg.get("norm_input_max"),
            dcfg.get("norm_input_min"), dcfg.get("norm_output_scale"))
        print(json.dumps({"norm_files": norm_prov}))
        if cfg.get("checkpoint_dir"):
            import os as _os
            _os.makedirs(cfg["checkpoint_dir"], exist_ok=True)
            with open(_os.path.join(cfg["checkpoint_dir"],
                                    "norm_files.json"), "w") as f:
                json.dump(norm_prov, f, indent=1)
        xm, xsd = np.asarray(nz.mean_lev), np.asarray(nz.div_lev)
        xms, xss = np.asarray(nz.mean_sfc), np.asarray(nz.div_sfc)
        ysc_lev = np.asarray(nz.scale_lev)
        ysc_sfc = np.asarray(nz.scale_sfc)
        if xm.shape[1] != x_lev.shape[-1] or xms.shape[0] != x_sfc.shape[-1]:
            raise ValueError(
                f"data.norm=reference coefficient shapes {xm.shape}/"
                f"{xms.shape} do not match data {x_lev.shape}/"
                f"{x_sfc.shape}; check vset/preprocessing flags")
    else:
        if dcfg.get("input_norm_per_level", True):
            xm = x_lev.mean((0, 1)); xsd = x_lev.std((0, 1)) + 1e-8
        else:
            xm = x_lev.mean((0, 1, 2)); xsd = x_lev.std((0, 1, 2)) + 1e-8
        xms = x_sfc.mean((0, 1)); xss = x_sfc.std((0, 1)) + 1e-8
        if dcfg.get("output_norm_per_level", True):
            ysc_lev = 1.0 / (np.abs(y_lev).std((0, 1)) + 1e-12)
        else:
            ysc_lev = np.broadcast_to(
                1.0 / (np.abs(y_lev).std((0, 1, 2)) + 1e-12),
                y_lev.shape[2:]).copy()
        ysc_sfc = 1.0 / (np.abs(y_sfc).std((0, 1)) + 1e-12)
    sp = x_sfc[..., 0]
    x_lev_n = (x_lev - xm) / xsd
    x_sfc_n = (x_sfc - xms) / xss
    y_lev_n = y_lev * ysc_lev
    y_sfc_n = y_sfc * ysc_sfc

    # device-resident epoch data: upload the normalized series once and
    # chunk on-device (keeplev_chunks gathers jnp arrays in place), so
    # epochs stop re-transferring the dataset — through the TPU tunnel
    # that transfer dominated large-batch epoch time. auto = resident
    # when the series fits comfortably in HBM alongside training state.
    dev_cache = dcfg.get("device_cache", "auto")
    # raw level state is only consumed by physrnn forwards and the
    # state-consistency loss terms — don't burn HBM on it otherwise
    _lcfg0 = cfg.get("loss", {})
    need_raw = (cfg.get("model", {}).get("type", "rnn") == "physrnn"
                or _lcfg0.get("w_rh", 0.0) > 0
                or _lcfg0.get("w_qvpos", 0.0) > 0
                or _lcfg0.get("w_qnpos", 0.0) > 0)
    cached = (x_lev_n, x_sfc_n, y_lev_n, y_sfc_n, sp) + \
        ((x_lev_raw_src,) if need_raw else ())
    total_bytes = sum(a.size * 4 for a in cached)
    if dev_cache == "auto":
        dev_cache = total_bytes <= 4 * 1024**3
    if stream:
        dev_cache = False      # chunks move through the bounded pipeline
    if dev_cache:
        put = lambda a: jax.device_put(jnp.asarray(a, jnp.float32))
        x_lev_n, x_sfc_n = put(x_lev_n), put(x_sfc_n)
        y_lev_n, y_sfc_n = put(y_lev_n), put(y_sfc_n)
        sp = put(sp)
        if need_raw:
            # the raw-state snapshots ride along in physrnn / raw-loss runs
            x_lev_raw_src = put(x_lev_raw_src)

    # prev-step channels (reference include_prev_inputs/outputs,
    # rnn/utils.py:2095-2148: 6 input / 5 output level channels of the
    # previous timestep concatenated onto each step's inputs)
    def _nprev(key, default_n):
        v = dcfg.get(key, 0)
        if v is True:
            return default_n          # reference channel counts
        return int(v or 0)

    ipi = _nprev("include_prev_inputs", 6)
    ipo = _nprev("include_prev_outputs", 5)

    mcfg = cfg.get("model", {})
    model_type = mcfg.get("type", "rnn")      # rnn | physrnn

    def _policy(mcfg):
        # mixed-precision compute policy (the reference trains under AMP
        # autocast, rnn/utils.py:832-834; bf16 needs no GradScaler —
        # params/optimizer state stay f32)
        from ..models import BF16, F32
        return BF16 if str(mcfg.get("policy", "f32")).lower() == "bf16" \
            else F32
    if model_type == "physrnn":
        from ..models.phys_rnn import PhysicalRNNAutoreg
        ysl2 = np.asarray(ysc_lev, np.float32)
        ysl = ysl2.reshape(-1, ysl2.shape[-1]).mean(0)
        if ysl2.ndim == 2 and mcfg.get("per_level_yscale", False):
            # per-level yscale columns (the reference's yscale_lev[:, c]),
            # clipped to 100x around the column median — near-zero
            # tendency stds (quiet stratosphere levels) otherwise produce
            # degenerate 1e12 scales that overflow the decode. Intended
            # for REAL ClimSim norm files (smooth columns); synthetic-data
            # columns can still destabilize early training — prefer the
            # scalar default there.
            def ycol(c):
                col = ysl2[:, c]
                med = float(np.median(col))
                return tuple(float(v) for v in
                             np.clip(col, med / 100.0, med * 100.0))
        else:
            ycol = lambda c: float(ysl[c])
        model = PhysicalRNNAutoreg(
            nx=x_lev.shape[-1] + ipi + ipo, nx_sfc=x_sfc.shape[-1],
            ny=y_lev.shape[-1], ny_sfc=y_sfc.shape[-1],
            nneur=tuple(mcfg.get("nneur", (128, 128))),
            nh_mem=mcfg.get("nh_mem", 16),
            nreg=mcfg.get("nreg", 8),
            store_precip=mcfg.get("store_precip", True),
            ice_sedimentation=mcfg.get("ice_sedimentation", True),
            use_physrad=mcfg.get("use_physrad", False),
            separate_radiation=mcfg.get("separate_radiation", False),
            add_pres=mcfg.get("add_pres", False),
            update_states_for_rad=mcfg.get("update_states_for_rad", True),
            use_mcica=mcfg.get("use_mcica", False),
            use_tc=mcfg.get("use_tc", False),
            use_qv_variability=mcfg.get("use_qv_variability", False),
            use_pallas=mcfg.get("use_pallas", False),
            learned_cloud_optics=mcfg.get("learned_cloud_optics", False),
            ng_lw=mcfg.get("ng_lw", 8), ng_sw=mcfg.get("ng_sw", 8),
            hyai=tt(grid.hyai), hybi=tt(grid.hybi),
            hyam=tt(grid.hyam), hybm=tt(grid.hybm),
            sp_mean=float(xms[0]), sp_div=float(xss[0]),
            yscale_t=ycol(0), yscale_qv=ycol(1), yscale_qn=ycol(2),
            yscale_precc=float(np.asarray(ysc_sfc)[3]),
            policy=_policy(mcfg))
    else:
        model = None
    if model is None:
        model = RNNAutoreg(
            nx=x_lev.shape[-1] + ipi + ipo, nx_sfc=x_sfc.shape[-1],
            ny=y_lev.shape[-1], ny_sfc=y_sfc.shape[-1],
            nneur=tuple(mcfg.get("nneur", (192, 192))),
            nh_mem=mcfg.get("nh_mem", 16),
            # reference `memory: None` -> non-autoregressive (driver :110)
            use_memory=str(mcfg.get("memory", "Hidden")).lower() != "none",
            cell=mcfg.get("cell", "gru"),
            add_stochastic_layer=mcfg.get("add_stochastic_layer", False),
            # AR(1) noise modes (rnn/utils.py:940-959): 0 = uncorrelated,
            # 1/2 = temporally correlated with vertical structure,
            # 3 = fully correlated (one draw for all levels); the
            # reference's tau_t=0.5 is the default correlation
            ar_noise_rho=mcfg.get(
                "ar_noise_rho",
                0.5 if mcfg.get("ar_noise_mode", 0) > 0 else 0.0),
            ar_noise_vertical=mcfg.get("ar_noise_mode", 0) != 3,
            separate_radiation=mcfg.get("separate_radiation", False),
            use_pallas=mcfg.get("use_pallas", False),
            output_prune=mcfg.get("output_prune", True),
            add_pres=mcfg.get("add_pres", True),
            scan_unroll=mcfg.get("scan_unroll", 1),
            hyam=tt(grid.hyam), hybm=tt(grid.hybm),
            sp_mean=float(xms[0]), sp_div=float(xss[0]),
            policy=_policy(mcfg))

    rcfg = cfg.get("rollout", {})
    ocfg = cfg.get("optimizer", {})
    lcfg = cfg.get("loss", {})
    rc = RolloutConfig(
        rollout_schedule={int(k): v for k, v in
                          rcfg.get("schedule", {0: 1, 3: 2, 6: 3}).items()},
        loss=lcfg.get("name", "huber"),
        lr=ocfg.get("lr", 1e-3),
        optimizer=ocfg.get("name", "adam"),
        weight_decay=ocfg.get("weight_decay", 0.0),
        lr_schedule=ocfg.get("schedule"),
        schedule_steps=ocfg.get("schedule_steps", 10000),
        scheduler_max_lr=ocfg.get("scheduler_max_lr"),
        scheduler_min_lr=ocfg.get("scheduler_min_lr"),
        scheduler_pct_start=ocfg.get("scheduler_pct_start", 0.3),
        scheduler_annealing=ocfg.get("scheduler_annealing", "cos"),
        lr_gamma=ocfg.get("lr_gamma", 0.95),
        decay_every=ocfg.get("decay_every", 1000),
        warmup_steps=ocfg.get("warmup_steps", 200),
        w_main=lcfg.get("w_main", 1.0),
        w_energy=lcfg.get("w_hcon", 0.0),
        w_water=lcfg.get("w_wcon", 0.0),
        w_precip=lcfg.get("w_precip", 0.0),
        w_gel_precip=lcfg.get("w_gel_precip", 0.0),
        gel_lambda=lcfg.get("gel_lambda", 1.0),
        w_bias=lcfg.get("w_bias", 0.0),
        w_rh=lcfg.get("w_rh", 0.0),
        rh_max=lcfg.get("rh_max", 1.05),
        w_qvpos=lcfg.get("w_qvpos", 0.0),
        w_qnpos=lcfg.get("w_qnpos", 0.0),
        mp_mode=lcfg.get("mp_mode", 1),
        w_cld=lcfg.get("w_cld", 0.0),
        w_precip_neg=lcfg.get("w_precip_neg", 0.0),
        w_det=lcfg.get("w_det", 0.0),
        strat_temp_weight_factor=lcfg.get("strat_temp_weight_factor", 1.0),
        scalar_weight_factor=lcfg.get("scalar_weight_factor", 1.0),
        replay=rcfg.get("replay"),
        replay_slice=tuple(rcfg.get("replay_slice", (9, 14))),
        pred_slice=tuple(rcfg.get("pred_slice", (0, 5))),
        gradual_mixing_end_epoch=rcfg.get("gradual_mixing_end_epoch", 10),
        pass_x_raw=(model_type == "physrnn"),
        remat=rcfg.get("remat", False),
        ensemble_size=rcfg.get("ensemble_size", 1),
        ens_loss=rcfg.get("ens_loss", "crps"),
        ens_sumvar=rcfg.get("crps_sumvar", False),
        ens_beta=rcfg.get("beta", 1.0),
        crps_start_epoch=rcfg.get("crps_start_epoch", 0),
        timestepped_optimizer=ocfg.get("timestepped", False),
    )
    # raw level state is needed by the physics model's forward AND by the
    # state-consistency loss terms (computed above, pre device-cache)
    assert need_raw == (model_type == "physrnn" or rc.w_rh > 0
                        or rc.w_qvpos > 0 or rc.w_qnpos > 0)
    rc.pass_x_raw = need_raw
    apply_fn = None
    if model_type == "physrnn":
        # full tuple: the trainer reads aux['prec_negative'] (w_precip_neg);
        # optional y_true teacher-forces the radiation state update
        apply_fn = lambda p, xl, xs_, m, xr, yt=None: \
            model.apply(p, xl, xs_, m, xr, yt)
        # training-mode teacher forcing of the radiation state
        # (reference update_states_for_rad + out_new_true)
        rc.pass_y_true = bool(mcfg.get("use_physrad", False)
                              and mcfg.get("update_states_for_rad", True))
    mem_shape = None
    if model_type == "physrnn":
        mem_shape = lambda B, nlev: (B, 50, mcfg.get("nh_mem", 16) + 1)
    trainer = RolloutTrainer(model, rc, np.asarray(grid.hyai),
                             np.asarray(grid.hybi),
                             yscale_lev=jnp.asarray(ysc_lev)[None, None],
                             yscale_sca=jnp.asarray(ysc_sfc),
                             apply_fn=apply_fn, mem_shape=mem_shape)

    chunk = dcfg.get("chunk_size", 8)
    n_steps_total = stream_T if stream else x_lev.shape[0]
    ntr = n_train_steps if n_train_steps is not None else \
        int(n_steps_total * (1 - dcfg.get("val_frac", 0.2)))

    if stream:
        # normalize AFTER the raw predecessor row is available so the
        # prev-step channels are assembled from normalized arrays exactly
        # as the in-memory path does
        xm_a, xsd_a = np.asarray(xm), np.asarray(xsd)
        xms_a, xss_a = np.asarray(xms), np.asarray(xss)
        ysl_a, yss_a = np.asarray(ysc_lev), np.asarray(ysc_sfc)

        def raw_tf(xl, xs, yl, ys, off):
            xl, xr, xs = prep_raw(xl, xs)
            xln = (xl - xm_a) / xsd_a
            xsn = (xs - xms_a) / xss_a
            yln = yl * ysl_a
            ysn = ys * yss_a
            xl_c = xln[off:] if off else xln
            if ipo:
                xl_c = np.concatenate([xl_c, yln[:-1][..., :ipo]], axis=-1)
            if ipi:
                xl_c = np.concatenate([xl_c, xln[:-1][..., :ipi]], axis=-1)
            d = {"x_lev": xl_c, "x_sfc": xsn[off:], "y_lev": yln[off:],
                 "y_sfc": ysn[off:], "sp": xs[off:, :, 0]}
            if need_raw:
                d["x_lev_raw"] = xr[off:]
            return d

        def chunks(lo, hi, shuffle, seed=0):
            from ..data import stream_keeplev_chunks
            hi = n_steps_total if hi is None else hi
            n = hi - lo - (1 if (ipi or ipo) else 0)
            yield from stream_keeplev_chunks(
                stream_read, n_steps_total, B,
                chunk_size=max(1, min(chunk, n)), seed=seed,
                shuffle=shuffle, include_prev_inputs=ipi,
                include_prev_outputs=ipo, raw_transform=raw_tf,
                prefetch=int(dcfg.get("stream_prefetch", 2)),
                to_device=True, t_start=lo, t_stop=hi)

    def _mem_chunks(lo, hi, shuffle, seed=0):
        n = (hi if hi is not None else x_lev.shape[0]) - lo
        # prev-step channels consume the first step of each split
        if ipi or ipo:
            n = n - 1
        it = keeplev_chunks(x_lev_n[lo:hi], x_sfc_n[lo:hi],
                            y_lev_n[lo:hi], y_sfc_n[lo:hi], sp[lo:hi],
                            chunk_size=max(1, min(chunk, n)),
                            shuffle=shuffle, seed=seed,
                            include_prev_inputs=ipi,
                            include_prev_outputs=ipo)
        if not need_raw:
            yield from it
            return
        # raw state per step is needed (physics model forward and/or the
        # rh / positivity loss terms); chunk indices are shuffled so
        # recovering them by matching sp blocks is fragile — use
        # unshuffled contiguous chunks instead
        cs = max(1, min(chunk, n))
        off = 1 if (ipi or ipo) else 0
        for i, c in enumerate(keeplev_chunks(
                x_lev_n[lo:hi], x_sfc_n[lo:hi], y_lev_n[lo:hi],
                y_sfc_n[lo:hi], sp[lo:hi], chunk_size=cs, shuffle=False,
                include_prev_inputs=ipi, include_prev_outputs=ipo)):
            # raw snapshot taken after the humidity rewrites but before
            # the cloud transforms (the reference's x_lev_b_denorm);
            # prev-step channels shift the chunk start by one step, so
            # the raw slice must shift with it
            c["x_lev_raw"] = x_lev_raw_src[lo:hi][off + i * cs:
                                                  off + (i + 1) * cs]
            yield c

    if not stream:
        chunks = _mem_chunks

    if model_type == "physrnn":
        first = next(iter(chunks(0, ntr, False)))
        memc = jnp.zeros((first["x_lev"].shape[1], 50,
                          mcfg.get("nh_mem", 16) + 1), jnp.float32)
        params = model.init(jax.random.PRNGKey(cfg.get("seed", 0)),
                            jnp.asarray(first["x_lev"][0]),
                            jnp.asarray(first["x_sfc"][0]), memc,
                            jnp.asarray(first["x_lev_raw"][0]))
        opt_state = trainer.tx.init(params)
        mem = memc
    else:
        params, opt_state, mem = trainer.init(
            jax.random.PRNGKey(cfg.get("seed", 0)),
            next(iter(chunks(0, ntr, False))))

    from ..train.rollout import (run_epoch_fused, save_rollout_checkpoint,
                                 restore_rollout_checkpoint)
    ckpt = cfg.get("checkpoint_dir")
    start_epoch = 0
    if ckpt and cfg.get("resume"):
        # resume from the best retained checkpoint (driver :759-792)
        params, opt_state, mem, ep0 = restore_rollout_checkpoint(
            ckpt, params, opt_state, mem)
        start_epoch = ep0 + 1
        print(f"resumed from {ckpt} at epoch {ep0}")
    elif cfg.get("init_from"):
        # freeze-retrain: partial-load a donor checkpoint, then zero
        # updates for matching parameter paths (driver freeze mode)
        from ..train.finetune import partial_load, freeze
        import orbax.checkpoint as ocp
        import os as _os
        # ref-free restore: the donor may differ in structure/shapes —
        # partial_load copies only path+shape matches
        donor = ocp.PyTreeCheckpointer().restore(
            _os.path.abspath(cfg["init_from"]))
        params, nl, ns = partial_load(params, donor["params"])
        print(f"init_from: loaded {nl} tensors, kept {ns}")
        patterns = cfg.get("freeze_patterns")
        if patterns:
            trainer.tx = freeze(trainer.tx, params, list(patterns))
            opt_state = trainer.tx.init(params)

    log_path = cfg.get("log_path")
    fused = cfg.get("fused", True)

    def eval_scoreboard(params, mem):
        """Run the model over the validation split and compute the full
        monitored scoreboard (epoch_metrics). Returns (metrics dict,
        (pred_lev, true_lev) raw-unit arrays for profile plots)."""
        from ..train.epoch_metrics import epoch_metrics
        pl_, ps_, tl_, ts_, sps = [], [], [], [], []
        mem_e = None
        for c in chunks(ntr, None, False):
            Tc = c["x_lev"].shape[0]
            if mem_e is None:
                Bc = c["x_lev"].shape[1]
                mem_e = mem if mem is not None else jnp.zeros(
                    (Bc, 60, mcfg.get("nh_mem", 16)), jnp.float32)
            for t in range(Tc):
                args = [jnp.asarray(c["x_lev"][t]),
                        jnp.asarray(c["x_sfc"][t]), mem_e]
                if model_type == "physrnn":
                    args.append(jnp.asarray(c["x_lev_raw"][t]))
                    out, osfc, mem_e = apply_fn(params, *args)[:3]
                else:
                    # AR-noise models return a 4th eps output
                    out, osfc, mem_e = model.apply(params, *args)[:3]
                pl_.append(np.asarray(out) / np.asarray(ysc_lev))
                ps_.append(np.asarray(osfc) / np.asarray(ysc_sfc))
                tl_.append(c["y_lev"][t] / np.asarray(ysc_lev))
                ts_.append(c["y_sfc"][t] / np.asarray(ysc_sfc))
                sps.append(c["sp"][t])
        cat = lambda a: np.concatenate(a, axis=0)
        met = epoch_metrics(jnp.asarray(cat(pl_)), jnp.asarray(cat(ps_)),
                            jnp.asarray(cat(tl_)), jnp.asarray(cat(ts_)),
                            jnp.asarray(cat(sps)), np.asarray(grid.hyai),
                            np.asarray(grid.hybi))
        return met, (cat(pl_), cat(ps_), cat(tl_), cat(ts_), cat(sps))

    # per-epoch scoreboard cadence (the reference logs ~40 metrics to
    # wandb EVERY epoch, rnn/utils.py:1413-1766); 0 = only at the end
    report_every = int(cfg.get("eval_report_every", 0))
    for epoch in range(start_epoch, cfg.get("epochs", 10)):
        if fused:
            params, opt_state, mem, rec = run_epoch_fused(
                trainer, params, opt_state, mem,
                chunks(0, ntr, True, seed=epoch),
                epoch)
        else:
            params, opt_state, mem, rec = trainer.run_epoch(
                params, opt_state, mem,
                chunks(0, ntr, True, seed=epoch), epoch)
        if epoch >= cfg.get("val_epoch_start", 0):
            # validation skipped before val_epoch_start (driver :953)
            _, _, _, vrec = trainer.run_epoch(
                params, opt_state, None, chunks(ntr, None, False), epoch,
                train=False)
            rec["val_loss"] = vrec["loss"]
        else:
            rec["val_loss"] = rec["loss"]
        if report_every and (epoch + 1) % report_every == 0:
            met, _ = eval_scoreboard(params, mem)
            rec.update({k: v for k, v in met.items() if k != "r2_lev"})
        print(json.dumps(rec))
        if log_path:
            with open(log_path, "a") as f:
                f.write(json.dumps(rec) + "\n")
        if not np.isfinite(rec["loss"]):
            print("non-finite loss; aborting (two-strikes policy)")
            return 2
        if ckpt:
            # best-K retention by val loss, memory state included
            save_rollout_checkpoint(ckpt, params, opt_state, mem, epoch,
                                    val_loss=float(rec["val_loss"]),
                                    keep_top_k=cfg.get("keep_top_k", 3))
    eval_cache = None      # (met, arrays) shared by eval_report/pred_export
    if cfg.get("eval_report"):
        # final validation scoreboard + per-level R2 profile plot (the
        # reference driver's per-epoch val_eval/ figures, :1047-1097)
        eval_cache = eval_scoreboard(params, mem)
        met, (P_, _, T_, _, _) = eval_cache
        met_print = {k: v for k, v in met.items() if k != "r2_lev"}
        print(json.dumps({"eval_report": met_print}))
        if log_path:
            with open(log_path, "a") as f:
                f.write(json.dumps({"eval_report": met}) + "\n")
        pdir = cfg.get("plots_dir")
        if pdir:
            import os as _os
            _os.makedirs(pdir, exist_ok=True)
            try:
                from ..metrics.plots import profile_plot
                r2 = 1.0 - ((P_ - T_) ** 2).sum(0) \
                    / np.maximum(((T_ - T_.mean(0)) ** 2).sum(0), 1e-30)
                profile_plot({f"ch{j}": r2[:, j]
                              for j in range(r2.shape[1])},
                             metric_name="R2",
                             save_path=_os.path.join(
                                 pdir, "val_r2_profile.png"))
            except Exception as e:
                print(f"(no plot: {e})")

    pred_dir = cfg.get("pred_export")
    if pred_dir:
        # scoring triplet for the offline evaluation CLI: teacher-forced
        # one-step predictions over the validation split, written RAW in
        # the reference's flat registry layout (the per-model inference
        # step that feeds evaluation/ClimSim_metrics.many-trials.v2.py)
        import os as _os
        from ..data.ingest import keeplev_to_flat
        _os.makedirs(pred_dir, exist_ok=True)
        # reuse the eval_report pass if it already ran (ADVICE r4: avoid
        # a second full validation sweep)
        _, (PL, PS_, TL, TS, SP) = (eval_cache if eval_cache is not None
                                    else eval_scoreboard(params, mem))
        np.save(_os.path.join(pred_dir, "scoring_pred.npy"),
                keeplev_to_flat(PL, PS_, vset.outputs))
        np.save(_os.path.join(pred_dir, "scoring_target.npy"),
                keeplev_to_flat(TL, TS, vset.outputs))
        np.save(_os.path.join(pred_dir, "scoring_ps.npy"),
                np.asarray(SP, np.float32))
        print(f"pred_export: wrote scoring_{{pred,target,ps}}.npy to "
              f"{pred_dir} (score with: python -m climsim_tpu.cli.evaluate "
              f"--raw --vset {vset.name} --ps .../scoring_ps.npy ...)")

    export_path = cfg.get("export_path")
    if export_path:
        # deployment artifact: jittable forward with baked params,
        # serialized as StableHLO (the TorchScript-export analog)
        from ..export.serialize import export_step
        first = next(iter(chunks(0, ntr, False)))
        xm0 = jnp.asarray(first["x_lev"][0])
        xs0 = jnp.asarray(first["x_sfc"][0])
        m0 = mem if mem is not None else jnp.zeros(
            (xm0.shape[0], xm0.shape[1],
             mcfg.get("nh_mem", 16)), jnp.float32)
        if model_type == "physrnn":
            xr0 = jnp.asarray(first["x_lev_raw"][0])
            fn = lambda xm_, xs_, m_, xr_: model.apply(params, xm_, xs_,
                                                       m_, xr_)[:3]
            n = export_step(fn, (xm0, xs0, m0, xr0), export_path)
        else:
            fn = lambda xm_, xs_, m_: model.apply(params, xm_, xs_, m_)
            n = export_step(fn, (xm0, xs0, m0), export_path)
        print(f"exported {n} bytes of StableHLO to {export_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
