"""Column energy/water conservation residuals and positivity diagnostics.

TPU-native re-implementation of the physics-invariant checks that form the
reference's de-facto QA layer (rnn/metrics.py:193-315) and the column-energy
loss of the online trainers
(online_testing/baseline_models/*/training/loss_energy.py:7-63).

Conventions match the reference exactly (so loss curves are comparable):
* energy metric uses cp=1004, Lv=2.5104e6, Ls=2.8440e6, 1/g=0.1020408163
  and column residual
      E = sum_l dp_l/g * (cp*dT_l - Lv*dql_l - Ls*dqi_l) - Lv*rain - Ls*snow
  with rain = 1000*(PRECC - PRECSC), snow = 1000*PRECSC
  (rnn/metrics.py:197-238).
* water metric uses 1/g=0.1019716213 and
      W = sum_l dp_l/g * (dqv + dql + dqi)_l + 1000*PRECC
  (rnn/metrics.py:241-315; lhs - rhs with rhs = -precip).

Output-channel layout follows the keeplev v4 target tensor:
  lev channels  [dT, dqv, dql, dqi, du, dv]
  sfc channels  [NETSW, FLWDS, PRECSC, PRECC, SOLS, SOLL, SOLSD, SOLLD]
"""
from __future__ import annotations

import jax.numpy as jnp

# the reference's energy/water functions use slightly different constants
# from data_utils — kept verbatim for curve parity
_CP_E = 1004.0
_LV_E = 2.5104e6
_LS_E = 2.8440e6
_ONE_OVER_G_ENERGY = 0.1020408163   # 1/9.8   (rnn/metrics.py:202)
_ONE_OVER_G_WATER = 0.1019716213    # 1/9.806 (rnn/metrics.py:249)


def layer_thickness(sp: jnp.ndarray, hyai: jnp.ndarray, hybi: jnp.ndarray,
                    one_over_g: float) -> jnp.ndarray:
    """dp/g per layer from surface pressure [B] -> [B, nlev]."""
    dhyb = hybi[1:] - hybi[:-1]
    dhya = hyai[1:] - hyai[:-1]
    return one_over_g * (sp[:, None] * dhyb + 1.0e5 * dhya)


def energy_residual(y_lev: jnp.ndarray, y_sfc: jnp.ndarray, sp: jnp.ndarray,
                    hyai: jnp.ndarray, hybi: jnp.ndarray) -> jnp.ndarray:
    """Column energy residual [W m-2] per sample (rnn/metrics.py:197-238).

    y_lev: [B, nlev, >=4] tendencies (dT, dqv, dql, dqi, ...)
    y_sfc: [B, >=4] surface scalars with PRECSC at 2, PRECC at 3.
    """
    thick = layer_thickness(sp, hyai, hybi, _ONE_OVER_G_ENERGY)
    dT, dql, dqi = y_lev[:, :, 0], y_lev[:, :, 2], y_lev[:, :, 3]
    snow = 1000.0 * y_sfc[:, 2]
    prec = 1000.0 * y_sfc[:, 3]
    rain = prec - snow
    col = jnp.sum(thick * (dT * _CP_E - dql * _LV_E - dqi * _LS_E), axis=1)
    return col - rain * _LV_E - snow * _LS_E


def energy_conservation_mse(y_true_lev, y_true_sfc, y_pred_lev, y_pred_sfc,
                            sp, hyai, hybi, timesteps: int = 1) -> jnp.ndarray:
    """MSE between predicted and true column-energy residuals, averaged over
    the rollout window first (rnn/metrics.py:230-238)."""
    e_t = energy_residual(y_true_lev, y_true_sfc, sp, hyai, hybi)
    e_p = energy_residual(y_pred_lev, y_pred_sfc, sp, hyai, hybi)
    e_t = e_t.reshape(timesteps, -1).mean(axis=0)
    e_p = e_p.reshape(timesteps, -1).mean(axis=0)
    return jnp.mean(jnp.square(e_p - e_t))


def water_residual(y_lev: jnp.ndarray, y_sfc: jnp.ndarray, sp: jnp.ndarray,
                   hyai: jnp.ndarray, hybi: jnp.ndarray) -> jnp.ndarray:
    """Column water residual [kg m-2 s-1] per sample: vertically-integrated
    total-water tendency plus surface precipitation (rnn/metrics.py:241-315)."""
    thick = layer_thickness(sp, hyai, hybi, _ONE_OVER_G_WATER)
    dq_tot = jnp.sum(y_lev[:, :, 1:4], axis=2)
    lhs = jnp.sum(thick * dq_tot, axis=1)
    precip = 1000.0 * y_sfc[:, 3]
    return lhs + precip  # == lhs - (-precip)


def water_conservation_mse(y_pred_lev, y_pred_sfc, sp, hyai, hybi,
                           timesteps: int = 1) -> jnp.ndarray:
    r = water_residual(y_pred_lev, y_pred_sfc, sp, hyai, hybi)
    r = r.reshape(timesteps, -1).mean(axis=0)
    return jnp.mean(jnp.square(r))


def cloud_water_path(y_lev, sp, hyai, hybi) -> jnp.ndarray:
    """Vertically-integrated condensate tendency (rnn/metrics.py:303-305)."""
    thick = layer_thickness(sp, hyai, hybi, _ONE_OVER_G_WATER)
    return jnp.sum(thick * jnp.sum(y_lev[:, :, 2:4], axis=2), axis=1)


def negative_fraction(x: jnp.ndarray) -> jnp.ndarray:
    """Positivity diagnostic: fraction of strictly negative entries
    (rnn/utils.py:1280-1312 positivity checks)."""
    return jnp.mean((x < 0.0).astype(jnp.float32))
