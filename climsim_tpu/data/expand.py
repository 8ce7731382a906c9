"""Expanded-feature derivation: previous-step state, physics tendencies,
and dynamics forcings.

Vectorized equivalent of the ClimSim-Online feature-expansion pipeline
(online_testing/data_preparation/expand_feature/climsim_adding_input.py:
6-81), which writes ``.mlexpand.`` files with:
  tm_X           = X from the previous input step
  X_prvphy       = (mlo_prev - mli_prev)/1200   (previous physics tendency)
  X_dyn          = (mli - mlo_prev)/1200        (dynamics forcing)
  tm_X_prvphy / tm_X_dyn = the two-steps-back versions
  clat/slat/icol = cos(lat), sin(lat), 1..ncol

The reference runs a multiprocessing pool over netCDF file pairs; here the
whole time series is transformed in one vectorized pass (jit-able), which
is how the device-resident pipeline wants it.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .. import constants as C

DT = C.DT_STEP


def derive_tendencies(state_in: jnp.ndarray,
                      state_out: jnp.ndarray) -> jnp.ndarray:
    """ptend = (mlo - mli)/1200 over any matching arrays
    (data_utils.get_target:735-745)."""
    return (state_out - state_in) / DT


def expand_features(mli: dict[str, jnp.ndarray], mlo: dict[str, jnp.ndarray],
                    var_names: tuple = ("state_t", "state_q0001",
                                        "state_q0002", "state_q0003",
                                        "state_u")):
    """Compute the expanded feature dict from time-major input/output
    state arrays ([T, ncol, nlev] per variable).

    Returns dict of [T, ncol, nlev] arrays for tm_*/prvphy/dyn features,
    valid from step 2 (first two steps use zero-padded history like the
    reference skips the first files).
    """
    out: dict[str, jnp.ndarray] = {}

    def shift(a, n):
        """a[t-n] with edge replication at the start."""
        pad = jnp.repeat(a[:1], n, axis=0)
        return jnp.concatenate([pad, a[:-n]], axis=0)

    for name in var_names:
        x_in = mli[name]
        x_out = mlo[name]
        prvphy = derive_tendencies(shift(x_in, 1), shift(x_out, 1))
        dyn = (x_in - shift(x_out, 1)) / DT
        out[f"tm_{name}"] = shift(x_in, 1)
        out[f"{name}_prvphy"] = prvphy
        out[f"tm_{name}_prvphy"] = shift(prvphy, 1)
        out[f"{name}_dyn"] = dyn
        out[f"tm_{name}_dyn"] = shift(dyn, 1)

    # merged humidity forcing: q0 = total-water dynamics (v4 uses
    # state_q0_dyn for the sum of the three water species)
    if all(f"state_q000{i}_dyn" in out for i in (1, 2, 3)):
        out["state_q0_dyn"] = (out["state_q0001_dyn"]
                               + out["state_q0002_dyn"]
                               + out["state_q0003_dyn"])
        out["tm_state_q0_dyn"] = (out["tm_state_q0001_dyn"]
                                  + out["tm_state_q0002_dyn"]
                                  + out["tm_state_q0003_dyn"])
    return out


def location_features(lat: jnp.ndarray, lon: jnp.ndarray):
    """clat/slat/icol scalars (climsim_adding_input.py; data_utils
    get_xrdata icol derivation :676-680)."""
    return {"clat": jnp.cos(jnp.deg2rad(lat)),
            "slat": jnp.sin(jnp.deg2rad(lat)),
            "icol": jnp.arange(1, lat.shape[0] + 1, dtype=lat.dtype)}
