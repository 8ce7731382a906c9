"""One-command REAL-DATA dress rehearsal: raw netCDF tree -> ingest ->
reference-norm training -> pred_export -> reference-protocol evaluation.

This proves the day-one path for when the actual ClimSim archive is
mounted (the raw netCDFs are stripped from this environment): a
fabricated E3SM-MMF.mli/mlo file tree with the full v4_rnn variable set
is pushed through the EXACT pipeline a user would run on real data —

  1. `data.filelist.FileLists` + `data.ingest.ingest`: regex file lists,
     derived inputs (rh, clat/slat from grid info), (mlo-mli)/1200
     tendency targets, keeplev H5 store
     (reference: preprocessing/create_npy_data_new.py + climsim_utils/
     data_utils.py get_xrdata/get_target);
  2. `cli.train_rollout` on that H5 with data.norm=reference (per-level
     coefficients from the shipped input_*_v4_pervar.nc +
     output_scale_std_lowerthred_v5.nc norm files, assembled as the
     reference hydra driver does) — flagship RNNAutoreg, rollout
     windows, checkpointing, teacher-forced pred_export;
  3. `cli.evaluate` on the exported scoring triplet with the
     unscale -> dp/g -> area -> energy weighting chain (reference:
     evaluation/ClimSim_metrics.many-trials.v2.py).

Swap `--tree` for the real archive root (and drop --fabricate) to run
the identical chain on real data.

Usage:
  python examples/dress_rehearsal.py [--platform cpu] [--keep]
"""
import argparse
import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GRID = "/root/reference/grid_info/ClimSim_low-res_grid-info.nc"


def fabricate_tree(root, n_steps=32, ncol=384, nlev=60, seed=0):
    """Write a time-correlated E3SM-MMF.mli/mlo pair sequence with the
    full v4_rnn raw variable set (HDF5 containers, readable by
    climsim_tpu.io like the real CDF files)."""
    import h5py
    import numpy as np

    rng = np.random.default_rng(seed)
    sub = os.path.join(root, "0001-02")
    os.makedirs(sub, exist_ok=True)
    lat = None
    try:
        from climsim_tpu.grid import Grid
        lat = np.asarray(Grid.from_file(GRID).lat)[:ncol]
    except Exception:
        lat = np.linspace(-88, 88, ncol)
    coslat = np.cos(np.deg2rad(lat))

    # smooth evolving state with a diurnal cycle
    T = 250.0 + 40.0 * coslat[:, None] * np.linspace(0.6, 1.0, nlev) \
        + rng.normal(0, 2, (ncol, nlev))
    qv = np.abs(rng.normal(1e-3, 3e-4, (ncol, nlev)))
    qc = np.abs(rng.normal(1e-5, 3e-6, (ncol, nlev)))
    qi = np.abs(rng.normal(1e-5, 3e-6, (ncol, nlev)))
    u = rng.normal(0, 10, (ncol, nlev))
    v = rng.normal(0, 3, (ncol, nlev))
    ps = 1e5 + 3e3 * (coslat - coslat.mean())
    oz = 5e-6 * np.exp(-((np.linspace(0, 1, nlev) - 0.15) / 0.12) ** 2)

    lonrad = np.linspace(0, 2 * np.pi, ncol, endpoint=False)

    def cosz(t_idx):
        # diurnal cycle + a small scattered-light ripple so every
        # column's radiative channels carry time-axis variance in any
        # scoring window (the reference R2 convention is time-TSS;
        # nighttime-constant zeros would score -inf)
        mu = np.clip(coslat * np.cos(lonrad + 2 * np.pi * t_idx / 72.0),
                     0, 1)
        return mu + 0.01 * coslat * (1 + np.sin(2 * np.pi * t_idx / 5.0))

    def state_dict(t_idx, T, qv, qc, qi, u, v, dyn):
        mu = cosz(t_idx)
        d = {
            "state_t": T, "state_q0001": qv, "state_q0002": qc,
            "state_q0003": qi, "state_u": u, "state_v": v,
            "state_ps": ps,
            "pbuf_SOLIN": 1360.0 * np.ones(ncol),
            "pbuf_COSZRS": mu,
            "pbuf_LHFLX": np.clip(90 * coslat * (0.7 + 0.6 * mu), 5, None),
            "pbuf_SHFLX": np.clip(25 * coslat * (0.7 + 0.6 * mu), 2, None),
            "pbuf_TAUX": 0.05 * np.tanh(u[:, -1] / 10.0),
            "pbuf_TAUY": 0.05 * np.tanh(v[:, -1] / 10.0),
            "pbuf_ozone": np.broadcast_to(oz, (ncol, nlev)).copy(),
            "pbuf_CH4": np.full((ncol, nlev), 9.7e-7),
            "pbuf_N2O": np.full((ncol, nlev), 4.8e-7),
            "cam_in_ALDIF": np.full(ncol, 0.3),
            "cam_in_ALDIR": np.full(ncol, 0.3),
            "cam_in_ASDIF": np.full(ncol, 0.3),
            "cam_in_ASDIR": np.full(ncol, 0.3),
            "cam_in_LWUP": 5.67e-8 * T[:, -1] ** 4,
            "cam_in_ICEFRAC": np.clip(1 - 2 * coslat, 0, 1),
            "cam_in_LANDFRAC": np.full(ncol, 0.3),
            "cam_in_OCNFRAC": np.full(ncol, 0.7),
            "cam_in_SNOWHICE": np.clip(0.1 - 0.2 * coslat, 0, None),
            "cam_in_SNOWHLAND": np.clip(0.05 - 0.1 * coslat, 0, None),
        }
        # dynamics + previous-step channels (real archive carries these)
        d.update(dyn)
        return d

    dyn_keys = ("state_t_dyn", "state_q0_dyn", "state_u_dyn")
    dyn = {k: rng.normal(0, a, (ncol, nlev))
           for k, a in zip(dyn_keys, (1e-5, 1e-9, 1e-5))}
    tm = {f"tm_{k}": v for k, v in dyn.items()}
    tm.update({"tm_state_ps": ps, "tm_pbuf_SOLIN": 1360.0 * np.ones(ncol),
               "tm_pbuf_LHFLX": np.clip(90 * coslat, 5, None),
               "tm_pbuf_SHFLX": np.clip(25 * coslat, 2, None),
               "tm_pbuf_COSZRS": np.clip(coslat, 0, 1)})

    stamps = []
    for t_idx in range(n_steps):
        mu = cosz(t_idx)
        # smooth 'physics': relax T to a solar profile, condense moisture
        dT = ((255 + 45 * coslat[:, None] * mu[:, None]
               * np.linspace(0.6, 1.0, nlev) - T) * 2e-6
              + rng.normal(0, 5e-6, (ncol, nlev)))
        dq = -2e-9 * np.tanh((qv / 1e-3) - 1) + rng.normal(
            0, 2e-10, (ncol, nlev))
        dqc = 1e-10 * mu[:, None] - 0.1 * qc * 1e-4
        dqi = 5e-11 * (1 - mu[:, None]) - 0.1 * qi * 1e-4
        du, dv = -u * 1e-6, -v * 1e-6
        T2, qv2 = T + 1200 * dT, np.clip(qv + 1200 * dq, 1e-9, None)
        qc2 = np.clip(qc + 1200 * dqc, 0, None)
        qi2 = np.clip(qi + 1200 * dqi, 0, None)
        u2, v2 = u + 1200 * du, v + 1200 * dv

        day, sec = 1 + t_idx // 72, (t_idx % 72) * 1200
        stamp = f"0001-02-{day:02d}-{sec:05d}"
        stamps.append(stamp)
        mli = state_dict(t_idx, T, qv, qc, qi, u, v, {**dyn, **tm})
        mlo = {"state_t": T2, "state_q0001": qv2, "state_q0002": qc2,
               "state_q0003": qi2, "state_u": u2, "state_v": v2,
               "cam_out_NETSW": 1360 * 0.7 * mli["pbuf_COSZRS"],
               "cam_out_FLWDS": 5.67e-8 * 0.8 * T[:, -1] ** 4,
               # convective baseline keeps every column's precip
               # time-varying (rainless-constant zeros score -inf R2)
               "cam_out_PRECC": np.clip(-dq.sum(1) * 800 / 1e3, 0, None)
               + 1e-8 * (0.2 + coslat) * (1 + np.sin(
                   2 * np.pi * t_idx / 7.0)),
               "cam_out_PRECSC": np.clip(-dq.sum(1) * 80 / 1e3, 0, None)
               + 1e-9 * (0.2 + coslat) * (1 + np.cos(
                   2 * np.pi * t_idx / 9.0)),
               "cam_out_SOLS": 1360 * 0.21 * mli["pbuf_COSZRS"],
               "cam_out_SOLL": 1360 * 0.24 * mli["pbuf_COSZRS"],
               "cam_out_SOLSD": 1360 * 0.10 * mli["pbuf_COSZRS"],
               "cam_out_SOLLD": 1360 * 0.14 * mli["pbuf_COSZRS"]}
        for ab, d in (("mli", mli), ("mlo", mlo)):
            with h5py.File(os.path.join(
                    sub, f"E3SM-MMF.{ab}.{stamp}.nc"), "w") as f:
                for k, val in d.items():
                    f.create_dataset(k, data=np.asarray(val, np.float64))
        T, qv, qc, qi, u, v = T2, qv2, qc2, qi2, u2, v2
    return stamps


def run(cmd):
    print("+", " ".join(cmd), flush=True)
    r = subprocess.run(cmd, cwd=REPO)
    if r.returncode != 0:
        raise SystemExit(f"command failed rc={r.returncode}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--tree", default=None,
                    help="raw netCDF archive root (default: fabricate)")
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--workdir", default=None)
    args = ap.parse_args()

    work = args.workdir or tempfile.mkdtemp(prefix="dress_rehearsal_")
    os.makedirs(work, exist_ok=True)
    tree = args.tree
    if tree is None:
        tree = os.path.join(work, "raw")
        print(f"fabricating {args.steps}-step raw tree at {tree}")
        fabricate_tree(tree, n_steps=args.steps)

    # 1. ingest: file lists -> keeplev H5
    from climsim_tpu.grid import Grid
    from climsim_tpu import variables as V
    from climsim_tpu.data.filelist import FileLists
    from climsim_tpu.data.ingest import ingest

    grid = Grid.from_file(GRID)
    vset = V.get("v4_rnn")
    fl = FileLists(tree)
    fl.set_regexps("train", ["*/E3SM-MMF.mli.0001-*.nc"])
    fl.set_stride_sample("train", 1)
    h5 = os.path.join(work, "train.h5")
    n = ingest(fl, vset, grid, h5, "train", progress=True)
    print(f"ingested {n} rows -> {h5}")

    # 2. reference-norm training + teacher-forced pred_export (real CLI)
    overrides = [
        f"data.h5_path={h5}", f"epochs={args.epochs}",
        "model.nneur=[64,64]", f"pred_export={work}/pred",
        f"checkpoint_dir={work}/ckpt", "eval_report=true",
        f"log_path={work}/train_log.jsonl",
    ]
    if args.platform:
        overrides.append(f"platform={args.platform}")
    run([sys.executable, "-m", "climsim_tpu.cli.train_rollout",
         "conf/autoreg_gru_refnorm.yaml"] + overrides)

    # 3. reference-protocol evaluation of the exported predictions
    run([sys.executable, "-m", "climsim_tpu.cli.evaluate",
         "--raw", "--vset", "v4_rnn",
         "--ps", f"{work}/pred/scoring_ps.npy",
         "--target", f"{work}/pred/scoring_target.npy",
         "--pred", f"{work}/pred/scoring_pred.npy",
         "--out", f"{work}/metrics.csv",
         "--out-lev", f"{work}/metrics_lev.csv"]
        + (["--platform", args.platform] if args.platform else []))

    print(json.dumps({"dress_rehearsal": "OK", "workdir": work,
                      "rows": n, "metrics": f"{work}/metrics.csv"}))


if __name__ == "__main__":
    main()
