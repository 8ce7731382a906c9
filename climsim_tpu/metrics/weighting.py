"""Standardized output weighting: unscale -> dp/g -> area -> energy units.

Vectorized, jit-able re-design of the reference's unrolled per-variable chain
(climsim_utils/data_utils.py:1523-1725 ``output_weighting`` and
:1448-1498 ``set_pressure_grid``): one fused elementwise pass over the whole
flat output tensor instead of ~40 per-variable numpy statements.

Chain (exact reference semantics, SURVEY.md §7.4 contract 4):
  [0] undo output scaling    y / scale          (if the data was normalized)
  [1] x dp/g                 level-resolved variables only; dp from hybrid
                             interface pressures of each sample's ps
  [2] x area_wgt             area/mean(area) per column
  [3] x energy conversion    cp (dT), Lv (dq-like), Lv*rho_h2o (precip);
                             winds carry conv=None in the reference and are
                             excluded from energy metrics — we weight them
                             by 1 and leave exclusion to the metric tables.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .. import constants as C
from .. import variables as V
from ..grid import Grid


def static_feature_weights(vset: V.VariableSet, dtype=np.float64) -> np.ndarray:
    """Per-feature energy-conversion multiplier [ny] (chain step [3])."""
    out = np.ones(vset.outputs.total, dtype)
    for name in vset.outputs.names:
        conv = V.ENERGY_CONV.get(name, 1.0)
        out[vset.outputs.slices[name]] = 1.0 if conv is None else conv
    return out


def lev_feature_mask(vset: V.VariableSet, dtype=np.float64) -> np.ndarray:
    """1.0 for features belonging to level-resolved variables [ny]."""
    out = np.zeros(vset.outputs.total, dtype)
    for name in vset.outputs.names:
        if V.var_len(name) == V.NLEV:
            out[vset.outputs.slices[name]] = 1.0
    return out


def weight_outputs(y: jnp.ndarray, ps_raw: jnp.ndarray, vset: V.VariableSet,
                   grid: Grid, scale: jnp.ndarray | None = None) -> jnp.ndarray:
    """Apply the full weighting chain.

    y:      [T, ncol, ny] scaled (normalized) or raw outputs in flat layout.
    ps_raw: [T, ncol] un-normalized surface pressure [Pa].
    scale:  [ny] output scaling to undo, or None if y is already raw.

    Returns [T, ncol, ny] in common energy units (W/m^2 for the energy vars).
    """
    ny = vset.outputs.total
    if scale is not None:
        y = y / scale

    dp_over_g = grid.layer_thickness(ps_raw) / C.GRAV       # [T, ncol, nlev]
    mask = jnp.asarray(lev_feature_mask(vset), y.dtype)      # [ny]
    # tile dp over the level-var blocks: feature j of a lev var at level l
    # gets dp[..., l]. Build an index map feature -> level (0 for scalars).
    lev_index = np.zeros(ny, np.int32)
    for name in vset.outputs.lev_names:
        sl = vset.outputs.slices[name]
        lev_index[sl] = np.arange(V.NLEV)
    dp_feat = dp_over_g[..., jnp.asarray(lev_index)]         # [T, ncol, ny]
    y = y * jnp.where(mask > 0, dp_feat, 1.0)

    y = y * grid.area_wgt[None, :, None]
    y = y * jnp.asarray(static_feature_weights(vset), y.dtype)
    return y


def recover_ps(x: jnp.ndarray, vset: V.VariableSet, mean_ps: float,
               div_ps: float, normalized: bool = True) -> jnp.ndarray:
    """Recover raw surface pressure from the flat input tensor
    (data_utils.set_pressure_grid:1455-1459)."""
    ps = x[..., vset.ps_index]
    if normalized:
        ps = ps * div_ps + mean_ps
    return ps


def split_variables(y: jnp.ndarray, vset: V.VariableSet) -> dict[str, jnp.ndarray]:
    """Split a flat [..., ny] tensor into per-variable arrays
    ([..., nlev] for level vars, [...] for scalars)."""
    out = {}
    for name in vset.outputs.names:
        sl = vset.outputs.slices[name]
        arr = y[..., sl]
        out[name] = arr[..., 0] if sl.stop - sl.start == 1 else arr
    return out
