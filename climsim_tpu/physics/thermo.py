"""Saturation thermodynamics and moisture conversions (pure jnp).

Re-implements, TPU-side, the polynomial saturation-pressure fits and derived
moisture features of the reference:

* ``eliq``/``eice`` polynomial fits        (climsim_utils/data_utils.py:19-44)
* ``state_rh`` derivation q -> RH          (data_utils.py:662-673)
* RH -> q inversion used by the inference
  wrapper                                  (rnn/utils.py:674-814)
* ``liq_partition`` temperature ramp       (data_utils.py:683-689)
* snow-fraction ramp                       (rnn/models/models.py:268-271)

Everything is elementwise jnp so XLA fuses it into adjacent matmuls; the
polynomials are evaluated with Horner's scheme on the VPU.
"""
from __future__ import annotations

import jax.numpy as jnp

from .. import constants as C

# polynomial coefficients, highest order first (data_utils.py:23-37)
_A_LIQ = (-0.976195544e-15, -0.952447341e-13, 0.640689451e-10,
          0.206739458e-7, 0.302950461e-5, 0.264847430e-3,
          0.142986287e-1, 0.443987641, 6.11239921)
_A_ICE = (0.252751365e-14, 0.146898966e-11, 0.385852041e-9,
          0.602588177e-7, 0.615021634e-5, 0.420895665e-3,
          0.188439774e-1, 0.503160820, 6.11147274)
# ice branch constants (data_utils.py:39)
_C_ICE = (273.15, 185.0, -100.0, 0.00763685, 0.000151069, 7.48215e-07)


def _polyval(coeffs, x):
    acc = jnp.full_like(x, coeffs[0])
    for c in coeffs[1:]:
        acc = acc * x + c
    return acc


def eliq(T: jnp.ndarray) -> jnp.ndarray:
    """Liquid saturation pressure [Pa] from temperature [K]."""
    return 100.0 * _polyval(_A_LIQ, jnp.maximum(-80.0, T - C.T0_FREEZE))


def eice(T: jnp.ndarray) -> jnp.ndarray:
    """Ice saturation pressure [Pa]; three-branch polynomial fit."""
    c = _C_ICE
    dT = T - C.T0_FREEZE
    warm = eliq(T)
    mid = 100.0 * _polyval(_A_ICE, dT)
    dTc = jnp.maximum(c[2], dT)
    cold = 100.0 * (c[3] + dTc * (c[4] + dTc * c[5]))
    return jnp.where(T > c[0], warm, jnp.where(T > c[1], mid, cold))


def liquid_fraction(T: jnp.ndarray, t_low: float = C.T_ICE_RAMP,
                    t_high: float = C.T0_FREEZE) -> jnp.ndarray:
    """omega ramp: 0 below 253.16 K, 1 above 273.16 K (data_utils.py:683-689).

    Identical to the reference's ``liq_partition`` input feature and the
    mp_mode temperature scaling (rnn/models/models.py:260-266)."""
    return jnp.clip((T - t_low) / (t_high - t_low), 0.0, 1.0)


def snow_fraction(T_sfc: jnp.ndarray) -> jnp.ndarray:
    """Fraction of frozen precipitation from near-surface temperature; linear
    ramp over [T0-10, T0] (rnn/models/models.py:268-271)."""
    return 1.0 - jnp.clip((T_sfc - (C.T0_FREEZE - 10.0)) / 10.0, 0.0, 1.0)


def esat(T: jnp.ndarray) -> jnp.ndarray:
    """Blended saturation pressure: omega*eliq + (1-omega)*eice [Pa]."""
    w = liquid_fraction(T)
    return w * eliq(T) + (1.0 - w) * eice(T)


def qsat(T: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Saturation specific humidity: (Rd/Rv) * esat / p (data_utils.py:670-671).

    ``p`` is mid-level pressure [Pa]."""
    return (C.RD * esat(T)) / (C.RV * p)


def specific_to_relative_humidity(q: jnp.ndarray, T: jnp.ndarray,
                                  p: jnp.ndarray) -> jnp.ndarray:
    """q [kg/kg] -> RH (unitless), the ``state_rh`` derived input."""
    return q / qsat(T, p)


def relative_to_specific_humidity(rh: jnp.ndarray, T: jnp.ndarray,
                                  p: jnp.ndarray) -> jnp.ndarray:
    """RH -> q [kg/kg], inverse transform used at the online boundary
    (rnn/utils.py:674-814)."""
    return rh * qsat(T, p)


# ---- Clausius-Clapeyron variant (rnn/metrics.py:318-476) ----

_ES0 = 611.2       # Pa, saturation vapor pressure at the triple point
_RV_CC = 461.5     # J/(kg K)
_LV0 = 2.501e6     # J/kg
_LV_SLOPE = -2370.0  # J/(kg K), linear T-dependence of Lv
_EPSILON = 0.622   # Rd/Rv mass ratio


def esat_cc(T: jnp.ndarray) -> jnp.ndarray:
    """Clausius-Clapeyron saturation vapor pressure with linearly
    T-dependent latent heat (rnn/metrics.py:341-360)."""
    Lv = _LV0 + _LV_SLOPE * (T - C.T0_FREEZE)
    return _ES0 * jnp.exp((Lv / _RV_CC) * (1.0 / C.T0_FREEZE - 1.0 / T))


def specific_to_relative_humidity_cc(q, T, p, return_excess: bool = False):
    """q -> RH via Clausius-Clapeyron with proper vapor-pressure algebra
    (rnn/metrics.py:318-380): e = q p / (eps + q (1-eps)).
    return_excess=True gives the supersaturation excess in kg/kg."""
    e_sat = esat_cc(T)
    if return_excess:
        q_sat = (_EPSILON * e_sat) / (p - e_sat * (1.0 - _EPSILON))
        return jnp.maximum(q - q_sat, 0.0)
    e_actual = (q * p) / (_EPSILON + q * (1.0 - _EPSILON))
    return e_actual / e_sat
