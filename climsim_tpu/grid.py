"""Grid metadata + hybrid sigma-pressure coordinate ops (device-resident).

Mirrors the grid bookkeeping of the reference ``data_utils`` class
(climsim_utils/data_utils.py:46-175: area_wgt = area/mean(area), lat/lon sort
keys, hyai/hybi/hyam/hybm, P0) and the pressure ops of ``rnn/layers.py``
(LayerPressure :101-121, PressureThickness :123-136, LevelPressure :138-151),
re-designed as pure jnp functions over a frozen :class:`Grid` pytree so they
fuse into any jitted model.

Pressure contract (data_utils.set_pressure_grid :1448-1463):
    p_int[l] = P0*hyai[l] + hybi[l]*ps        (61 interface levels)
    dp[l]    = p_int[l+1] - p_int[l]          (60 layers)
    p_mid[l] = P0*hyam[l] + hybm[l]*ps        (60 mid levels)
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from . import constants as C
from .io import read_netcdf


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class Grid:
    """Static grid info as device arrays. Registered as a pytree so it can be
    closed over or passed through jit boundaries."""

    lat: jnp.ndarray      # [ncol] degrees
    lon: jnp.ndarray      # [ncol] degrees
    area: jnp.ndarray     # [ncol] steradian-ish weights
    area_wgt: jnp.ndarray # [ncol] area / mean(area)
    hyai: jnp.ndarray     # [nlev+1]
    hybi: jnp.ndarray     # [nlev+1]
    hyam: jnp.ndarray     # [nlev]
    hybm: jnp.ndarray     # [nlev]
    p0: float = C.P0

    def tree_flatten(self):
        children = (self.lat, self.lon, self.area, self.area_wgt,
                    self.hyai, self.hybi, self.hyam, self.hybm)
        return children, (self.p0,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, p0=aux[0])

    @property
    def ncol(self) -> int:
        return self.lat.shape[0]

    @property
    def nlev(self) -> int:
        return self.hyam.shape[0]

    @classmethod
    def from_file(cls, path: str, dtype=jnp.float32) -> "Grid":
        raw = read_netcdf(path)
        area = np.asarray(raw["area"], np.float64)
        p0 = float(np.asarray(raw["P0"]).ravel()[0]) if "P0" in raw else C.P0
        j = lambda x: jnp.asarray(np.asarray(x), dtype)
        return cls(
            lat=j(raw["lat"]), lon=j(raw["lon"]),
            area=j(area), area_wgt=j(area / area.mean()),
            hyai=j(raw["hyai"]), hybi=j(raw["hybi"]),
            hyam=j(raw["hyam"]), hybm=j(raw["hybm"]),
            p0=p0,
        )

    @classmethod
    def synthetic(cls, ncol: int = C.NCOL_LOWRES, nlev: int = C.NLEV,
                  dtype=jnp.float32, seed: int = 0) -> "Grid":
        """Deterministic stand-in grid when the real grid file is unavailable
        (e.g. pure-unit-test contexts). Hybrid coefficients interpolate from
        pure-pressure aloft to terrain-following at the surface."""
        rng = np.random.default_rng(seed)
        lat = np.linspace(-88.0, 88.0, ncol)
        lon = np.linspace(0.0, 360.0, ncol, endpoint=False)
        area = 0.02 + 0.015 * np.cos(np.deg2rad(lat))
        s = np.linspace(0.0, 1.0, nlev + 1) ** 1.4
        hyai = (1.0 - s) * s * 4.0 * 0.05 + s * 0.0  # bulge then 0 at sfc
        hyai = np.maximum.accumulate(np.where(s < 0.5, s * 0.1, (1 - s) * 0.1))
        hyai = np.concatenate([[5e-5], np.maximum(hyai[1:], 5e-5)])
        hybi = np.clip((s - 0.3) / 0.7, 0.0, 1.0) ** 1.2
        hyam = 0.5 * (hyai[1:] + hyai[:-1])
        hybm = 0.5 * (hybi[1:] + hybi[:-1])
        del rng
        j = lambda x: jnp.asarray(x, dtype)
        return cls(lat=j(lat), lon=j(lon), area=j(area),
                   area_wgt=j(area / area.mean()),
                   hyai=j(hyai), hybi=j(hybi), hyam=j(hyam), hybm=j(hybm))

    # ---- pressure ops (all shapes: ps [...], returns [..., nlev(+1)]) ----

    def interface_pressure(self, ps: jnp.ndarray) -> jnp.ndarray:
        """p at the 61 interfaces: P0*hyai + hybi*ps."""
        return self.p0 * self.hyai + self.hybi * ps[..., None]

    def mid_pressure(self, ps: jnp.ndarray) -> jnp.ndarray:
        """p at the 60 layer midpoints: P0*hyam + hybm*ps."""
        return self.p0 * self.hyam + self.hybm * ps[..., None]

    def layer_thickness(self, ps: jnp.ndarray) -> jnp.ndarray:
        """dp[l] = p_int[l+1] - p_int[l] (positive, increases downward)."""
        pint = self.interface_pressure(ps)
        return pint[..., 1:] - pint[..., :-1]

    def mass_weights(self, ps: jnp.ndarray) -> jnp.ndarray:
        """dp/g — the per-layer air-mass column weighting [kg m-2]."""
        return self.layer_thickness(ps) / C.GRAV
