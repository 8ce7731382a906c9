"""The online hybrid host loop: emulator + advection in one jitted step.

This is the framework's replacement for the reference's Fortran E3SM-MMF +
FTorch coupling (SURVEY.md §3.4): per coupled 20-minute step the column
emulator produces physics tendencies, the state advances
``X[t+1] = X[t] + dt * (ptend_phys + ptend_dyn)`` (the semi-online
equations, rnn/utils.py:994-1060), and the horizontal dynamics operator
(finite-volume or semi-Lagrangian advection on the structured proxy grid)
transports T/q/qc/qi/u/v. Everything lives in one ``lax.scan`` under jit —
no serialization boundary, and the whole rollout is differentiable.

Multi-chip: columns shard over the mesh 'col' axis (latitude-band
decomposition of the proxy grid); the advection stencil gets ghost rows via
ppermute halo exchange (climsim_tpu.parallel.halo) which XLA overlaps with
the emulator's column-local compute.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C
from ..grid import Grid
from . import advection as adv


@dataclass(frozen=True)
class HostLoopConfig:
    nlat: int = 16
    nlon: int = 24
    dt: float = C.DT_STEP
    scheme: str = "fv"          # fv | semi_lagrangian | none
    vertical_advection: bool = False  # omega-diagnosed vertical transport
    fix_water: bool = True      # multiplicative tracer mass fixer
    # winds -> CFL conversion: proxy-grid cell sizes (m). ne4 low-res cells
    # are ~O(1000 km); the advecting CFL stays < 1 for |u| < dx/dt.
    dx: float = 1.2e6
    dy: float = 1.2e6

    @property
    def dt_dx(self):
        return self.dt / self.dx

    @property
    def dt_dy(self):
        return self.dt / self.dy


class HybridLoop:
    """Couples a raw-units emulator step with the advection host dynamics.

    emulator_step(x_main_raw [B,L,nx], x_sfc_raw [B,ns], mem)
        -> (ptend_lev [B,L,6], sfc_fluxes [B,8], mem)
    State layout: prognostic fields [ncol, nlev] for T, qv, qc, qi, u, v
    (channels 0..5 of x_main in the v4 ordering: T, rh->qv handled by the
    caller's feature builder).
    """

    def __init__(self, emulator_step, grid: Grid,
                 cfg: HostLoopConfig = HostLoopConfig(),
                 feature_builder=None):
        self.emulator = emulator_step
        self.grid = grid
        self.cfg = cfg
        lat = np.asarray(grid.lat)
        lon = np.asarray(grid.lon)
        self.gather_idx, self.scatter_idx = adv.build_proxy_grid(
            lat, lon, cfg.nlat, cfg.nlon)
        self.gather_idx = jnp.asarray(self.gather_idx)
        self.scatter_idx = jnp.asarray(self.scatter_idx)
        # feature_builder(state dict) -> (x_main_raw, x_sfc_raw); default
        # passes the prognostic channels straight through
        self.feature_builder = feature_builder

    # -------------------------------------------------------------- dynamics

    def advect(self, field: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray):
        """Transport one [ncol, nlev] field with column winds [ncol, nlev]."""
        cfg = self.cfg
        if cfg.scheme == "none":
            return field
        fg = adv.to_grid(field, self.gather_idx, cfg.nlat, cfg.nlon)
        ug = adv.to_grid(u, self.gather_idx, cfg.nlat, cfg.nlon)
        vg = adv.to_grid(v, self.gather_idx, cfg.nlat, cfg.nlon)
        # vmap over levels; velocities in CFL units
        if cfg.scheme == "fv":
            step = lambda q, uu, vv: adv.fv_advect_2d(
                q, uu, vv, cfg.dt_dx, cfg.dt_dy)
        else:
            step = lambda q, uu, vv: adv.semi_lagrangian_2d(
                q, uu, vv, cfg.dt_dx, cfg.dt_dy)
        out = jax.vmap(step, in_axes=2, out_axes=2)(fg, ug, vg)
        return adv.to_columns(out, self.scatter_idx)

    # ---------------------------------------------------------------- step

    def coupled_step(self, state: dict, mem, x_sfc_raw):
        """One 20-minute hybrid step. state: dict of [ncol, nlev] prognostic
        fields {T, qv, qc, qi, u, v}; returns (new_state, mem, diagnostics).
        """
        cfg = self.cfg
        if self.feature_builder is not None:
            x_main_raw, x_sfc = self.feature_builder(state, x_sfc_raw)
        else:
            x_main_raw = jnp.stack([state["T"], state["qv"], state["qc"],
                                    state["qi"], state["u"], state["v"]],
                                   axis=-1)
            x_sfc = x_sfc_raw

        ptend, sfc_fluxes, mem = self.emulator(x_main_raw, x_sfc, mem)

        dt = cfg.dt
        T = state["T"] + dt * ptend[:, :, 0]
        qv = jnp.maximum(state["qv"] + dt * ptend[:, :, 1], 0.0)
        qc = jnp.maximum(state["qc"] + dt * ptend[:, :, 2], 0.0)
        qi = jnp.maximum(state["qi"] + dt * ptend[:, :, 3], 0.0)
        u = state["u"] + dt * ptend[:, :, 4]
        v = state["v"] + dt * ptend[:, :, 5]

        if cfg.vertical_advection and cfg.scheme != "none":
            # continuity-diagnosed omega -> conservative vertical transport
            dp = self.grid.layer_thickness(x_sfc[:, 0])
            omega = adv.diagnose_omega(
                u * (dt / cfg.dx), v * (dt / cfg.dy), 1.0, 1.0, dp,
                self.gather_idx, self.scatter_idx, cfg.nlat, cfg.nlon)
            T = adv.vertical_advect_column(T, omega, dp, 1.0)
            qv = adv.vertical_advect_column(qv, omega, dp, 1.0)
            qc = adv.vertical_advect_column(qc, omega, dp, 1.0)
            qi = adv.vertical_advect_column(qi, omega, dp, 1.0)

        # horizontal transport by the updated winds
        T_a = self.advect(T, u, v)
        qv_a = self.advect(qv, u, v)
        qc_a = self.advect(qc, u, v)
        qi_a = self.advect(qi, u, v)
        u_a = self.advect(u, u, v)
        v_a = self.advect(v, u, v)

        if cfg.fix_water and cfg.scheme != "none":
            w = self.grid.mass_weights(x_sfc[:, 0])  # dp/g from raw ps
            qv_a = adv.conservation_fixer(qv_a, qv, w)
            qc_a = adv.conservation_fixer(qc_a, qc, w)
            qi_a = adv.conservation_fixer(qi_a, qi, w)

        new_state = {"T": T_a, "qv": qv_a, "qc": qc_a, "qi": qi_a,
                     "u": u_a, "v": v_a}
        diags = {"sfc_fluxes": sfc_fluxes,
                 "precc": sfc_fluxes[:, 3],
                 "mean_T": jnp.mean(T_a)}
        return new_state, mem, diags

    def rollout(self, state: dict, mem, x_sfc_raw, n_steps: int):
        """N coupled steps as a lax.scan; returns final state + stacked
        diagnostics. x_sfc_raw may be [ncol, ns] (held fixed) or
        [n_steps, ncol, ns]."""
        time_varying = x_sfc_raw.ndim == 3

        def step(carry, inp):
            st, mem = carry
            sfc = inp if time_varying else x_sfc_raw
            st, mem, diags = self.coupled_step(st, mem, sfc)
            return (st, mem), diags

        xs = x_sfc_raw if time_varying else jnp.arange(n_steps)
        (state, mem), diags = jax.lax.scan(step, (state, mem), xs,
                                           length=None if time_varying
                                           else n_steps)
        return state, mem, diags


def sharded_hybrid_step(loop: HybridLoop, mesh, axis: str = "col"):
    """Multi-chip coupled step: proxy-grid fields latitude-sharded over the
    mesh; the emulator runs column-local inside shard_map while the FV
    stencil pulls its 2 ghost rows via ppermute (parallel.halo). Returns a
    jitted fn over grid-layout state dicts [nlat, nlon, nlev].
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    from ..parallel.halo import exchange_halo

    cfg = loop.cfg

    def local_step(state_g, mem, x_sfc_g):
        # state_g: [nlat_local, nlon, nlev] per field
        nlat_l, nlon, nlev = state_g["T"].shape
        flat = lambda a: a.reshape(nlat_l * nlon, *a.shape[2:])
        unflat = lambda a: a.reshape(nlat_l, nlon, *a.shape[1:])

        x_main = jnp.stack([flat(state_g[k]) for k in
                            ("T", "qv", "qc", "qi", "u", "v")], axis=-1)
        ptend, sfc_fluxes, mem = loop.emulator(x_main, flat(x_sfc_g), mem)
        ptend = ptend.reshape(nlat_l, nlon, nlev, 6)

        dt = cfg.dt
        upd = {
            "T": state_g["T"] + dt * ptend[..., 0],
            "qv": jnp.maximum(state_g["qv"] + dt * ptend[..., 1], 0.0),
            "qc": jnp.maximum(state_g["qc"] + dt * ptend[..., 2], 0.0),
            "qi": jnp.maximum(state_g["qi"] + dt * ptend[..., 3], 0.0),
            "u": state_g["u"] + dt * ptend[..., 4],
            "v": state_g["v"] + dt * ptend[..., 5],
        }

        idx = jax.lax.axis_index(axis)
        nsh = jax.lax.axis_size(axis)
        is_south = idx == 0
        is_north = idx == nsh - 1

        u_ext = exchange_halo(upd["u"], axis, 2)
        v_ext = exchange_halo(upd["v"], axis, 2)

        def advect_field(f):
            f_ext = exchange_halo(f, axis, 2)
            step1 = lambda q, uu, vv: adv.fv_advect_2d_halo(
                q, uu, vv, cfg.dt_dx, cfg.dt_dy, is_south, is_north)
            return jax.vmap(step1, in_axes=2, out_axes=2)(f_ext, u_ext,
                                                          v_ext)

        out = {k: advect_field(v2) for k, v2 in upd.items()}
        diags = {"mean_T": jax.lax.pmean(jnp.mean(out["T"]), axis)}
        return out, mem, diags

    from jax.sharding import PartitionSpec as P
    state_spec = {k: P(axis) for k in ("T", "qv", "qc", "qi", "u", "v")}
    fn = shard_map(local_step, mesh=mesh,
                   in_specs=(state_spec, P(axis), P(axis)),
                   out_specs=(state_spec, P(axis), P()))
    return jax.jit(fn)
