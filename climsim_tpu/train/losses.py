"""Training losses for flat emulators.

Mirrors the loss menu of the reference trainers:
* huber/mse/mae flatten combos               (rnn/metrics.py:116-178)
* per-variable-block weighted loss           (online_testing
  train_mlp_h5loader.py:238-269: separate weights per variable block)
* column-energy loss                         (loss_energy.py:7-63)

All functions take flat [B, ny] scaled outputs.
"""
from __future__ import annotations

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
