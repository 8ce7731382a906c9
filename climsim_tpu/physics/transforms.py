"""Cloud-condensate feature transforms (pure jnp, device-resident).

TPU-native replacements for the reference's numba fast-path kernels
(rnn/utils.py:1798-1865): the exponential cloud transform
``q -> 1 - exp(-q * lambda)``, its inverse, the sqrt-sqrt transform, and the
v4 -> v5 input conversion (qc+qi merged to qn + liquid-fraction channel).
All are elementwise jnp ops — XLA fuses them into the surrounding
normalization instead of looping on the host like the reference.
"""
from __future__ import annotations

import jax.numpy as jnp

from . import thermo


def cloud_exp_transform(q: jnp.ndarray, lbd: jnp.ndarray) -> jnp.ndarray:
    """q -> 1 - exp(-q*lambda); lambda broadcasts over levels
    (rnn/utils.py:1809-1815)."""
    return 1.0 - jnp.exp(-q * lbd)


def cloud_exp_inverse(y: jnp.ndarray, lbd: jnp.ndarray,
                      eps: float = 1e-12) -> jnp.ndarray:
    """Inverse of the exponential transform: -log(1-y)/lambda, clipped for
    numerical safety at y -> 1."""
    y = jnp.clip(y, 0.0, 1.0 - eps)
    return -jnp.log1p(-y) / lbd


def cloud_sqrt_transform(q: jnp.ndarray) -> jnp.ndarray:
    """Fourth-root transform q -> q**0.25 (rnn/utils.py:1817-1823)."""
    return jnp.sqrt(jnp.sqrt(q))


def signed_sqrt_scale(y: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """sign(y) * |y|**0.5... transform used by apply_output_norm_numba_sqrt
    (rnn/utils.py:1856-1865): sign(y) * sqrt(sqrt(|y|)) * scale."""
    return jnp.sign(y) * jnp.sqrt(jnp.sqrt(jnp.abs(y))) * scale


def v4_to_v5_inputs(x_lev: jnp.ndarray, T: jnp.ndarray,
                    lbd_qn: jnp.ndarray) -> jnp.ndarray:
    """Convert v4 level-input channels to v5: channel 2 (qc) and 3 (qi) become
    exp-transformed qn and the temperature-diagnosed liquid fraction
    (rnn/utils.py:1799-1807).

    x_lev: [..., nlev, nx] with qc at channel 2, qi at channel 3.
    T:     [..., nlev] air temperature for the liquid-fraction ramp.
    """
    qn = x_lev[..., 2] + x_lev[..., 3]
    qn_t = cloud_exp_transform(qn, lbd_qn)
    liq_frac = thermo.liquid_fraction(T)
    return x_lev.at[..., 2].set(qn_t).at[..., 3].set(liq_frac)
