"""Per-epoch monitored metrics for rollout training.

The reference logs ~40 scalars per epoch to wandb (rnn/utils.py:1413-1766):
per-variable level-mean R2, clear-sky radiation R2, water/energy
conservation residuals, positivity violations, precipitation 99.9-percentile
ratios, spread-skill for ensembles. This module reproduces that scoreboard
as one jit-able function over collected validation outputs, keeping the
reference metric names so training curves are directly comparable
(SURVEY.md §7.1 design mapping).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..physics import conservation

LEV_NAMES = ("dT", "dqv", "dqliq", "dqice", "du", "dv")


def epoch_metrics(pred_lev, pred_sfc, true_lev, true_sfc, sp, hyai, hybi,
                  x_denorm=None, ens_pred_lev=None) -> dict:
    """Compute the monitored scoreboard.

    pred/true_lev: [N, L, ny] raw-unit tendencies, pred/true_sfc [N, ns],
    sp [N] raw surface pressure. Optional x_denorm [N, L, >=4] raw state
    for positivity checks; ens_pred_lev [M, N, L, ny] for spread-skill.
    Returns {name: float}.
    """
    out: dict = {}
    ny = pred_lev.shape[-1]

    # per-variable R2 over (samples, levels): 1 - SSE/TSS with the
    # time-dimension TSS convention collapsed to the sample axis
    for j in range(min(ny, len(LEV_NAMES))):
        p, t = pred_lev[..., j], true_lev[..., j]
        sse = jnp.sum(jnp.square(p - t))
        tss = jnp.sum(jnp.square(t - t.mean()))
        out[f"R2_{LEV_NAMES[j]}"] = float(1.0 - sse / jnp.maximum(tss, 1e-30))

    sfc_names = ("NETSW", "FLWDS", "PRECSC", "PRECC", "SOLS", "SOLL",
                 "SOLSD", "SOLLD")
    for j in range(min(pred_sfc.shape[-1], len(sfc_names))):
        p, t = pred_sfc[:, j], true_sfc[:, j]
        sse = jnp.sum(jnp.square(p - t))
        tss = jnp.sum(jnp.square(t - t.mean()))
        out[f"R2_{sfc_names[j]}"] = float(1.0 - sse / jnp.maximum(tss, 1e-30))

    # conservation residuals (rnn/metrics.py definitions)
    if ny >= 4 and pred_sfc.shape[-1] >= 4:
        e = conservation.energy_residual(pred_lev, pred_sfc, sp, hyai, hybi)
        et = conservation.energy_residual(true_lev, true_sfc, sp, hyai, hybi)
        out["h_conservation"] = float(jnp.sqrt(jnp.mean(jnp.square(e - et))))
        w = conservation.water_residual(pred_lev, pred_sfc, sp, hyai, hybi)
        out["water_conservation"] = float(jnp.sqrt(jnp.mean(jnp.square(w))))

    # positivity diagnostics (rnn/utils.py:1280-1312): fraction of columns
    # where the updated state would go negative
    if x_denorm is not None and ny >= 4:
        qv_new = x_denorm[..., -1] + 1200.0 * pred_lev[..., 1]
        out["neg_qv_frac"] = float(jnp.mean((qv_new < 0).astype(jnp.float32)))
        qn_new = (x_denorm[..., 2] + x_denorm[..., 3]
                  + 1200.0 * (pred_lev[..., 2] + pred_lev[..., 3]))
        out["neg_qn_frac"] = float(jnp.mean((qn_new < 0).astype(jnp.float32)))
    if pred_sfc.shape[-1] >= 4:
        out["neg_precip_frac"] = float(
            jnp.mean((pred_sfc[:, 3] < 0).astype(jnp.float32)))
        # extreme-precip fidelity: 99.9th percentile ratio (:1313-1324)
        p999_pred = jnp.percentile(pred_sfc[:, 3], 99.9)
        p999_true = jnp.percentile(true_sfc[:, 3], 99.9)
        out["precip_p999_ratio"] = float(
            p999_pred / jnp.where(p999_true != 0, p999_true, 1.0))

    if ens_pred_lev is not None:
        from . import probabilistic as P
        out["spread_skill"] = float(P.spread_skill_ratio(
            ens_pred_lev.reshape(ens_pred_lev.shape[0], -1),
            true_lev.reshape(-1)))
    return out
