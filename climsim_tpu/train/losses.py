"""Training losses for flat emulators.

Mirrors the loss menu of the reference trainers:
* huber/mse/mae flatten combos               (rnn/metrics.py:116-178)
* per-variable-block weighted loss           (online_testing
  train_mlp_h5loader.py:238-269: separate weights per variable block)
* column-energy loss                         (loss_energy.py:7-63)

All functions take flat [B, ny] scaled outputs.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import variables as V


def huber(pred, target, delta: float = 1.0):
    err = pred - target
    a = jnp.abs(err)
    quad = jnp.minimum(a, delta)
    return jnp.mean(0.5 * quad ** 2 + delta * (a - quad))


def mse(pred, target):
    return jnp.mean(jnp.square(pred - target))


def mae(pred, target):
    return jnp.mean(jnp.abs(pred - target))


LOSS_FNS = {"huber": huber, "mse": mse, "mae": mae}


def block_weights(vset: V.VariableSet, weights: dict[str, float],
                  default: float = 1.0, dtype=np.float32) -> np.ndarray:
    """Per-feature weight vector from per-variable weights
    (train_mlp_h5loader.py:238-269 semantics)."""
    w = np.full(vset.outputs.total, default, dtype)
    for name, val in weights.items():
        w[vset.outputs.slices[name]] = val
    return w


def weighted_loss(pred, target, feature_w, kind: str = "huber",
                  delta: float = 1.0):
    err = pred - target
    if kind == "mse":
        per = jnp.square(err)
    elif kind == "mae":
        per = jnp.abs(err)
    else:
        a = jnp.abs(err)
        quad = jnp.minimum(a, delta)
        per = 0.5 * quad ** 2 + delta * (a - quad)
    return jnp.mean(per * feature_w)


def rh_consistency_loss(dqv_raw, dT_raw, qv_old, T_old, pmid,
                        dt: float = 1200.0, rh_max: float = 1.05):
    """Penalize predicted states that become supersaturated: the
    Clausius-Clapeyron RH-consistency term of the rollout loss
    (rnn/metrics.py:318-476; weight w_rh in the trainer config).

    All args raw units: tendencies [B, L], state [B, L], pmid [B, L] Pa.
    """
    from ..physics import thermo

    qv_new = jnp.maximum(qv_old + dt * dqv_raw, 0.0)
    T_new = jnp.maximum(T_old + dt * dT_raw, 100.0)
    rh = thermo.specific_to_relative_humidity_cc(qv_new, T_new, pmid)
    return jnp.mean(jnp.square(jnp.maximum(rh - rh_max, 0.0)))


def gel_loss(pred, target, lam: float = 1.0, fac: float = 1e-5):
    """Gamma-exponentiated loss (GEL) over layer outputs
    (rnn/metrics.py:1068-1105 ``get_GEL``): a gamma-NLL-style ratio loss
    exponentiated to base 2, |2^(1/lambda) - clamp(2^E, 100)| with
    E = mean(beta - alpha*log(beta)), alpha = p/t, beta = p^2/t on
    eps-shifted, fac-scaled values. Useful for strictly-positive heavy
    -tailed targets (precip-like)."""
    eps = jnp.finfo(jnp.float32).eps
    p = fac * pred + eps
    t = fac * target + eps
    beta = jnp.maximum(jnp.square(p) / t, eps)
    alpha = p / t
    logterm = alpha * jnp.log(beta)
    diff = beta - logterm
    # reference uses nansum / ntot (NaNs count toward the denominator)
    expterm = jnp.nansum(diff) / (lam * diff.size)
    loss = jnp.minimum(jnp.power(2.0, expterm), 100.0)
    return jnp.abs(2.0 ** (1.0 / lam) - loss)


def gel_precip_loss(true_sfc, pred_sfc, timesteps: int, lam: float = 1.0,
                    precc_index: int = 3, fac: float = 10000.0):
    """GEL on window-accumulated precipitation
    (rnn/metrics.py:1035-1066 ``get_GEL_precip``): average the PRECC
    channel over the rollout window per column, then apply the GEL ratio
    form 2^E. Args are [T*B, ny_sfc] stacked over the window."""
    eps = jnp.finfo(jnp.float32).eps
    pt = jnp.mean(true_sfc[:, precc_index].reshape(timesteps, -1), axis=0)
    pp = jnp.mean(pred_sfc[:, precc_index].reshape(timesteps, -1), axis=0)
    beta = jnp.maximum(jnp.square(fac * pp + eps) / (fac * pt + eps), eps)
    alpha = (fac * pp + eps) / (fac * pt + eps)
    expterm = jnp.mean(beta - alpha * jnp.log(beta)) / lam
    # the reference leaves 2^E unclamped (it only ever sees precip-scale
    # values); above E=30 grow linearly instead of exponentially so
    # early-training garbage predictions yield a large finite penalty
    # that still carries gradient
    expterm = jnp.minimum(expterm, 1e6)
    return jnp.exp2(jnp.minimum(expterm, 30.0)) \
        * (1.0 + jax.nn.relu(expterm - 30.0))


def absolute_bias_loss(pred_lev, true_lev, pred_sfc, true_sfc,
                       skip_top: int = 12):
    """Mean absolute batch-mean bias over level (below ``skip_top``) and
    surface outputs (rnn/metrics.py:82-101 ``compute_absolute_biases``,
    applied at rnn/utils.py:1322-1325 with weight w_bias): penalizes
    systematic offsets the squared losses hide behind variance.

    pred/true_lev [N, L, ny], pred/true_sfc [N, ny_sfc]; N may stack the
    rollout window.
    """
    d_lev = jnp.abs(jnp.nanmean(true_lev[:, skip_top:], axis=0)
                    - jnp.nanmean(pred_lev[:, skip_top:], axis=0))
    d_sfc = jnp.abs(jnp.nanmean(true_sfc, axis=0)
                    - jnp.nanmean(pred_sfc, axis=0))
    return jnp.nanmean(jnp.concatenate([jnp.nanmean(d_lev, axis=0),
                                        d_sfc]))
