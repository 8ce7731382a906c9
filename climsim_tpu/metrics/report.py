"""Per-variable metric tables (the scoreboard of website/evaluating.md).

Equivalent of data_utils.create_metrics_df / metrics_var / metrics_idx
(climsim_utils/data_utils.py:1937-2018) and the offline evaluation CLI
(evaluation/ClimSim_metrics.many-trials.v2.py): weighted per-variable
MAE/RMSE/R2/bias (+ CRPS for sampled predictions), globally averaged, with
level-resolved variables additionally averaged over levels.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import jax.numpy as jnp

from .. import variables as V
from ..grid import Grid
from . import metrics as M
from . import weighting


def evaluate(pred: jnp.ndarray, target: jnp.ndarray, ps_raw: jnp.ndarray,
             vset: V.VariableSet, grid: Grid,
             scale: jnp.ndarray | None = None,
             samplepreds: jnp.ndarray | None = None) -> pd.DataFrame:
    """Full weighted evaluation.

    pred/target: [T, ncol, ny] (scaled if ``scale`` given, else raw)
    ps_raw:      [T, ncol] un-normalized surface pressure
    samplepreds: optional [T, ncol, ny, S] for CRPS

    Returns a dataframe indexed by output variable with columns
    MAE/RMSE/R2/bias (and CRPS when samplepreds given), all in W/m^2 for
    energy-convertible variables.
    """
    wp = weighting.weight_outputs(pred, ps_raw, vset, grid, scale)
    wt = weighting.weight_outputs(target, ps_raw, vset, grid, scale)
    pv = weighting.split_variables(wp, vset)
    tv = weighting.split_variables(wt, vset)

    rows = {}
    for name in vset.outputs.names:
        p, t = pv[name], tv[name]
        row = {
            "MAE": float(jnp.mean(M.mae(p, t))),
            "RMSE": float(jnp.mean(M.rmse(p, t))),
            "R2": float(jnp.mean(M.r2(p, t))),
            "bias": float(jnp.mean(M.bias(p, t))),
        }
        rows[name] = row

    if samplepreds is not None:
        # the weighting chain is linear, so it is applied per sample before
        # the CRPS estimator (mirrors output_weighting_CRPS,
        # data_utils.py:1727-1773)
        S = samplepreds.shape[-1]
        wsp = jnp.stack([
            weighting.weight_outputs(samplepreds[..., s], ps_raw, vset, grid,
                                     scale) for s in range(S)], axis=-1)
        for name in vset.outputs.names:
            sl = vset.outputs.slices[name]
            sp = wsp[..., sl, :]
            t = tv[name]
            if sl.stop - sl.start == 1:
                sp = sp[..., 0, :]
            rows[name]["CRPS"] = float(jnp.mean(M.crps(sp, t)))

    return pd.DataFrame(rows).T


def per_level_table(pred, target, ps_raw, vset, grid,
                    scale=None) -> pd.DataFrame:
    """Level-resolved metrics for the profile variables (metrics_idx
    equivalent, data_utils.py:1937-2018)."""
    wp = weighting.weight_outputs(pred, ps_raw, vset, grid, scale)
    wt = weighting.weight_outputs(target, ps_raw, vset, grid, scale)
    pv = weighting.split_variables(wp, vset)
    tv = weighting.split_variables(wt, vset)
    frames = {}
    for name in vset.outputs.lev_names:
        p, t = pv[name], tv[name]
        frames[(name, "MAE")] = np.asarray(M.mae(p, t))
        frames[(name, "RMSE")] = np.asarray(M.rmse(p, t))
        frames[(name, "R2")] = np.asarray(M.r2(p, t))
        frames[(name, "bias")] = np.asarray(M.bias(p, t))
    return pd.DataFrame(frames)
