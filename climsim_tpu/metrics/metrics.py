"""Standardized metric estimators: MAE, RMSE, R2, bias, CRPS.

jnp re-implementation of climsim_utils/data_utils.py:1843-1935, with the
same estimator conventions:
* all metrics reduce over time first, then (optionally) average over the
  grid ("we decided to average globally at end");
* R2 uses the time-dimension total sum of squares;
* CRPS is the sorted-sample estimator with the pairwise-count spread term
  (num_CRPS=32 default, data_utils.py:560,1910-1935).

Shapes: vertically-resolved [time, ncol, nlev], scalars [time, ncol];
CRPS samples stacked on the trailing axis.
"""
from __future__ import annotations

import jax.numpy as jnp


def mae(pred: jnp.ndarray, target: jnp.ndarray, avg_grid: bool = True):
    m = jnp.abs(pred - target).mean(axis=0)
    return m.mean(axis=0) if avg_grid else m


def rmse(pred: jnp.ndarray, target: jnp.ndarray, avg_grid: bool = True):
    r = jnp.sqrt(jnp.square(pred - target).mean(axis=0))
    return r.mean(axis=0) if avg_grid else r


def r2(pred: jnp.ndarray, target: jnp.ndarray, avg_grid: bool = True):
    sq_diff = jnp.square(pred - target)
    tss = jnp.square(target - target.mean(axis=0, keepdims=True))
    out = 1.0 - sq_diff.sum(axis=0) / tss.sum(axis=0)
    return out.mean(axis=0) if avg_grid else out


def bias(pred: jnp.ndarray, target: jnp.ndarray, avg_grid: bool = True):
    b = pred.mean(axis=0) - target.mean(axis=0)
    return b.mean(axis=0) if avg_grid else b


def crps(samplepreds: jnp.ndarray, target: jnp.ndarray,
         avg_grid: bool = True):
    """Sorted-sample CRPS estimator (data_utils.calc_CRPS:1910-1935).

    samplepreds: [..., num_samples] with leading dims [time, ncol(, lev)].
    """
    num = samplepreds.shape[-1]
    mae_term = jnp.mean(jnp.abs(samplepreds - target[..., None]),
                        axis=(0, -1))
    s = jnp.sort(samplepreds, axis=-1)
    diff = s[..., 1:] - s[..., :-1]
    count = jnp.arange(1, num) * jnp.arange(num - 1, 0, -1)
    spread = (diff * count).sum(axis=-1).mean(axis=0)
    out = mae_term - spread / (num * (num - 1))
    return out.mean(axis=0) if avg_grid else out


METRIC_FNS = {"MAE": mae, "RMSE": rmse, "R2": r2, "bias": bias}
