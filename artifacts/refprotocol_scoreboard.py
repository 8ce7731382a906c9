"""Reference-protocol offline scoreboard on synthetic stand-in data.

The reference's de-facto acceptance tables (website/evaluating.md) are
MAE/RMSE/R2 per output variable on the real scoring split, with the
unscale -> dp/g -> area -> energy weighting chain
(climsim_utils/data_utils.py:1523-1935; CLI
evaluation/ClimSim_metrics.many-trials.v2.py). The raw climate netCDFs
are stripped from this environment (.MISSING_LARGE_BLOBS), so the tables
cannot be reproduced on real data here. This driver produces the closest
obtainable analog (round-3 VERDICT missing #1 / next #6):

1. train the flagship memory-BiGRU under the FULL reference chain —
   v4_rnn variable contract, data.norm=reference (per-level coefficients
   from input_*_v4_pervar.nc + output_scale_std_lowerthred_v5.nc,
   assembled exactly as the reference hydra driver) — on
   reference-shaped synthetic data (conf/autoreg_gru_refnorm.yaml via
   the real training CLI);
2. export teacher-forced scoring-split predictions in the reference's
   flat layout (cli pred_export);
3. score them with the offline evaluation CLI (cli/evaluate.py), which
   applies the reference weighting chain, into per-variable and
   per-level CSVs;
4. record the table in BASELINE.json "published" as the synthetic-data
   stand-in WITH AN EXPLICIT CAVEAT (the numbers are not comparable to
   the paper tables — different data distribution — but they are
   produced by the same protocol, so swapping in real npy files runs
   the identical pipeline).

Usage:
  python artifacts/refprotocol_scoreboard.py [--platform cpu] [--quick]
"""
import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ART = os.path.join(REPO, "artifacts")


def run(cmd, **kw):
    print("+", " ".join(cmd), flush=True)
    r = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True, **kw)
    sys.stdout.write(r.stdout[-4000:])
    if r.returncode != 0:
        sys.stderr.write(r.stderr[-4000:])
        raise SystemExit(f"command failed rc={r.returncode}")
    return r


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--steps", type=int, default=1536)
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--workdir", default="/tmp/refprotocol")
    args = ap.parse_args()
    if args.quick:
        args.steps, args.epochs = 96, 3

    os.makedirs(args.workdir, exist_ok=True)
    overrides = [
        f"data.steps={args.steps}", f"epochs={args.epochs}",
        f"pred_export={args.workdir}",
        f"log_path={args.workdir}/train_log.jsonl", "eval_report=true",
    ]
    if args.platform:
        overrides.append(f"platform={args.platform}")
    if args.quick:
        overrides.append("model.nneur=[32,32]")
    run([sys.executable, "-m", "climsim_tpu.cli.train_rollout",
         "conf/autoreg_gru_refnorm.yaml"] + overrides)

    csv = os.path.join(ART, "refprotocol_metrics.csv")
    csv_lev = os.path.join(ART, "refprotocol_metrics_lev.csv")
    run([sys.executable, "-m", "climsim_tpu.cli.evaluate",
         "--raw", "--vset", "v4_rnn",
         "--ps", f"{args.workdir}/scoring_ps.npy",
         "--target", f"{args.workdir}/scoring_target.npy",
         "--pred", f"{args.workdir}/scoring_pred.npy",
         "--out", csv, "--out-lev", csv_lev]
        + (["--platform", args.platform] if args.platform else []))

    # fold the table into BASELINE.json "published" with the caveat
    import csv as _csv
    with open(csv) as f:
        rows = list(_csv.reader(f))
    head = rows[0]

    def num(s):
        # R2's time-TSS convention (data_utils.calc_R2:1876) degenerates
        # to NaN/-inf on synthetic channels with no temporal variance;
        # JSON cannot hold them — record null (the CSV keeps the raw value)
        try:
            v = float(s)
        except ValueError:
            return None
        return round(v, 4) if abs(v) < 1e15 else None

    table = {r[0]: {head[j]: num(r[j]) for j in range(1, len(head))}
             for r in rows[1:]}
    bj_path = os.path.join(REPO, "BASELINE.json")
    with open(bj_path) as f:
        bj = json.load(f)
    bj["published"] = {
        "caveat": (
            "SYNTHETIC-DATA STAND-IN, not comparable to the paper tables:"
            " the raw ClimSim netCDFs are stripped from this environment,"
            " so the flagship memory-BiGRU was trained and scored on"
            " reference-shaped synthetic data (v4_rnn contract,"
            " data.norm=reference coefficients from the shipped norm"
            " files) under the reference protocol - teacher-forced"
            " scoring-split predictions, unscale->dp/g->area->energy"
            " weighting (climsim_utils/data_utils.py:1523-1935) - via"
            " cli/train_rollout (pred_export) + cli/evaluate. Swapping"
            " in real {scoring_input,target}.npy runs the identical"
            " pipeline."),
        "driver": "artifacts/refprotocol_scoreboard.py",
        "config": {"steps": args.steps, "epochs": args.epochs,
                   "model": "RNNAutoreg 192/192 nh_mem=16"
                   if not args.quick else "quick 32/32"},
        "units": "W/m2 for energy-convertible variables",
        "metrics_csv": "artifacts/refprotocol_metrics.csv",
        "per_level_csv": "artifacts/refprotocol_metrics_lev.csv",
        "table": table,
    }
    with open(bj_path, "w") as f:
        json.dump(bj, f, indent=2)
    print(f"wrote {csv}, {csv_lev}; BASELINE.json published updated")


if __name__ == "__main__":
    main()
