"""Export-equivalence validation harness: offline rollout of the wrapped
model over held-out data before shipping.

Equivalent of the reference's single-column offline validation inside every
wrapper script (rnn/save_wrapper_mem_prevtend_ftorch.py:430-760): re-run
the raw-units wrapper autoregressively over a held-out period, compare
against truth, and emit distribution/zonal-bias summaries (plots via
metrics.plots) plus pass/fail gates on NaNs and gross drift.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def offline_rollout(wrapper_step, x_main_raw_series, x_sfc_raw_series,
                    mem0, teacher_forced: bool = True):
    """Run the wrapper over a [T, B, ...] raw series.

    teacher_forced=True feeds the TRUE state each step (offline validation,
    memory still threads); False would require a host state advance (use
    climsim_tpu.online.HybridLoop for that).
    Returns (out_lev [T,B,L,ny], out_sfc [T,B,ns], final_mem).
    """
    def step(mem, inp):
        xm, xs = inp
        out, out_sfc, mem = wrapper_step(xm, xs, mem)
        return mem, (out, out_sfc)

    mem, (outs, out_sfcs) = jax.lax.scan(
        step, mem0, (x_main_raw_series, x_sfc_raw_series))
    return outs, out_sfcs, mem


def validate_export(wrapper_step, x_main_raw_series, x_sfc_raw_series,
                    y_true_lev, y_true_sfc, mem0, lat=None,
                    plot_dir: str | None = None) -> dict:
    """Full validation report: NaN gate, per-channel bias/rmse, optional
    zonal-bias plots. Returns a summary dict with 'passed'."""
    outs, out_sfcs, _ = jax.jit(
        lambda m: offline_rollout(wrapper_step, x_main_raw_series,
                                  x_sfc_raw_series, m))(mem0)
    outs = np.asarray(outs)
    out_sfcs = np.asarray(out_sfcs)
    yt = np.asarray(y_true_lev)
    yts = np.asarray(y_true_sfc)

    report: dict = {"nan_frac": float(np.mean(~np.isfinite(outs)))}
    err = outs - yt
    report["lev_bias"] = err.mean(axis=(0, 1, 2)).tolist()
    report["lev_rmse"] = np.sqrt((err ** 2).mean(axis=(0, 1, 2))).tolist()
    errs = out_sfcs - yts
    report["sfc_bias"] = errs.mean(axis=(0, 1)).tolist()
    report["sfc_rmse"] = np.sqrt((errs ** 2).mean(axis=(0, 1))).tolist()
    # error-vs-magnitude ratio: flags a broken export even when the model
    # is imperfect
    scale = np.sqrt((yt ** 2).mean(axis=(0, 1, 2))) + 1e-30
    report["rel_rmse"] = (np.asarray(report["lev_rmse"]) / scale).tolist()
    report["passed"] = bool(report["nan_frac"] == 0.0
                            and np.isfinite(outs).all())

    if plot_dir and lat is not None:
        import os
        from ..metrics.plots import zonal_mean_bias
        os.makedirs(plot_dir, exist_ok=True)
        for ch in range(min(outs.shape[-1], 4)):
            zonal_mean_bias(outs[..., ch], yt[..., ch], lat,
                            save_path=os.path.join(plot_dir,
                                                   f"zonal_bias_ch{ch}.png"),
                            var_name=f"channel {ch}")
        report["plots"] = plot_dir
    return report


def ensemble_error_correlation(ens_pred, truth):
    """Mean pairwise Pearson correlation of member ERROR fields
    (the ensemble-error-correlation analysis of the reference's wrapper
    validation harness, rnn/save_wrapper_mem_prevtend_ftorch.py:430-760).

    ens_pred [M, ...], truth [...]. ~0 = members make independent errors
    (ideal spread); ~1 = shared systematic error (ensemble adds nothing).
    """
    import jax.numpy as jnp

    M = ens_pred.shape[0]
    err = (ens_pred - truth[None]).reshape(M, -1)
    err = err - err.mean(axis=1, keepdims=True)
    norm = jnp.linalg.norm(err, axis=1)
    C = (err @ err.T) / jnp.maximum(norm[:, None] * norm[None, :], 1e-30)
    return (jnp.sum(C) - jnp.trace(C)) / (M * (M - 1))
