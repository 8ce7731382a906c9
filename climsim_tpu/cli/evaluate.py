"""Offline evaluation CLI — the per-trial scoring script equivalent
(evaluation/ClimSim_metrics.many-trials.v2.py:1-326): load input/target/
prediction arrays, recover raw ps, apply the unscale -> dp/g -> area ->
energy weighting chain, and write per-variable and per-level metric CSVs.

Usage:
    python -m climsim_tpu.cli.evaluate --input val_input.npy \
        --target val_target.npy --pred my_model_pred.npy \
        [--vset v1] [--samples samples.npy] [--out metrics.csv]
        [--platform cpu]

Arrays: flat [N, nx]/[N, ny] with N a multiple of 384 (time-major column
blocks), or [T, 384, ny]. Targets/preds may be normalized (default,
--scale-file or reference output_scale applied) or raw (--raw).
"""
from __future__ import annotations

import argparse
import sys

import numpy as np

NORM = "/root/reference/preprocessing/normalizations"


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--input", default=None,
                   help="flat input npy (for ps recovery); optional when "
                        "--ps is given")
    p.add_argument("--target", required=True)
    p.add_argument("--pred", required=True)
    p.add_argument("--samples", help="npy [.., ny, S] for CRPS")
    p.add_argument("--vset", default="v1")
    p.add_argument("--ncol", type=int, default=384)
    p.add_argument("--raw", action="store_true",
                   help="targets/preds already in raw units")
    p.add_argument("--scale-file", default=None,
                   help="output-scale .nc overriding the reference "
                        "output_scale.nc")
    p.add_argument("--ps", default=None,
                   help="npy of RAW surface pressure [N] or [T,ncol], "
                        "bypassing ps recovery from --input (for "
                        "expanded vsets whose inputs are not in the flat "
                        "norm files)")
    p.add_argument("--out", default="metrics.csv")
    p.add_argument("--out-lev", default=None)
    p.add_argument("--grid", default="/root/reference/grid_info/"
                   "ClimSim_low-res_grid-info.nc")
    p.add_argument("--platform", default=None)
    args = p.parse_args(argv)

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    from .. import variables as V
    from ..grid import Grid
    from ..data import Normalizer
    from ..metrics import evaluate, per_level_table

    vset = V.get(args.vset)
    grid = Grid.from_file(args.grid)

    def load(path, ny):
        a = np.load(path)
        if a.ndim == 2:
            T = a.shape[0] // args.ncol
            a = a[:T * args.ncol].reshape(T, args.ncol, ny)
        return a

    if not args.input and not args.ps:
        p.error("one of --input / --ps is required")
    x = load(args.input, vset.input_feature_len) if args.input else None
    t = load(args.target, vset.target_feature_len)
    pr = load(args.pred, vset.target_feature_len)

    nz = None
    try:
        nz = Normalizer.from_files(
            vset, f"{NORM}/inputs/input_mean.nc",
            f"{NORM}/inputs/input_max.nc", f"{NORM}/inputs/input_min.nc",
            args.scale_file or f"{NORM}/outputs/output_scale.nc")
    except KeyError:
        # expanded variable sets (v4/v4_rnn/v5) are not covered by the
        # flat v1/v2 norm files; fine when everything arrives raw
        if not args.raw:
            raise
    if args.ps:
        ps = np.load(args.ps)
        if ps.ndim == 1:
            ps = ps.reshape(-1, args.ncol)
    else:
        ps = np.asarray(x[..., vset.ps_index])
        # inputs normalized -> recover raw ps (set_pressure_grid:1455-1459)
        if nz is not None and abs(ps.mean()) < 1e3:  # heuristic
            ps = ps * float(nz.div[vset.ps_index]) \
                + float(nz.mean[vset.ps_index])
        elif nz is None and abs(ps.mean()) < 1e4:
            # --raw on an expanded vset skips the Normalizer, so the
            # recovery heuristic above can never fire: if --input holds
            # NORMALIZED values the pressure weighting would silently be
            # garbage. Refuse and ask for --ps (ADVICE r4).
            p.error(
                f"surface pressure from --input looks normalized "
                f"(mean {ps.mean():.3g}, expected raw pascals ~1e5) and "
                "no norm files cover this vset; pass raw ps via --ps")

    scale = None if args.raw else nz.scale
    samples = None
    if args.samples:
        s = np.load(args.samples)
        if s.ndim == 3:
            T = s.shape[0] // args.ncol
            s = s[:T * args.ncol].reshape(T, args.ncol, *s.shape[1:])
        samples = jnp.asarray(s)

    df = evaluate(jnp.asarray(pr), jnp.asarray(t), jnp.asarray(ps), vset,
                  grid, scale=scale, samplepreds=samples)
    df.to_csv(args.out)
    print(df.round(4).to_string())
    if args.out_lev:
        dfl = per_level_table(jnp.asarray(pr), jnp.asarray(t),
                              jnp.asarray(ps), vset, grid, scale=scale)
        dfl.to_csv(args.out_lev)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
