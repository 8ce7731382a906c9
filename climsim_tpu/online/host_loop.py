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
    # 'sphere' (default): real-geography metric terms from the grid file's
    # latitudes — per-row dx = a cos(phi) dlon, per-band dphi, cos(phi)
    # face factors, exact pole closure (advection.SphericalMetric; the
    # reference's real per-cell areas, climsim_utils/data_utils.py:74).
    # 'flat': the round-1 uniform raster with constant dx/dy below.
    geometry: str = "sphere"
    # fused pallas stencil (ops/pallas_stencil.fv_advect_tracers): all
    # prognostic fields advected in one kernel per level, u/v loaded once
    use_pallas: bool = False
    vertical_advection: bool = False  # omega-diagnosed vertical transport
    fix_water: bool = True      # multiplicative tracer mass fixer
    # flat-geometry winds -> CFL conversion: proxy-grid cell sizes (m).
    # ne4 low-res cells are ~O(1000 km); CFL stays < 1 for |u| < dx/dt.
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
        gather_np, scatter_np = adv.build_proxy_grid(
            lat, lon, cfg.nlat, cfg.nlon)
        self.gather_idx = jnp.asarray(gather_np)
        self.scatter_idx = jnp.asarray(scatter_np)
        # spherical metric from the ACTUAL column latitudes: band-mean
        # latitude per proxy row (the bands are built latitude-sorted)
        self.metric = None
        if cfg.geometry == "sphere":
            band_lats = lat[gather_np].reshape(cfg.nlat, cfg.nlon).mean(1)
            self.metric = adv.spherical_metric(band_lats, cfg.nlon, cfg.dt)
        # per-column area weights for PHYSICAL-units conservation
        # (reference area_wgt = area/mean(area), data_utils.py:74)
        self.area_wgt = getattr(grid, "area_wgt", None)
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
        if self.metric is not None:
            m = self.metric
            if cfg.scheme == "fv":
                step = lambda q, uu, vv: adv.fv_advect_2d_sphere(q, uu, vv,
                                                                 m)
            else:
                # per-row index-space displacements on the sphere
                step = lambda q, uu, vv: adv.semi_lagrangian_2d(
                    q, uu, vv, m.dtdx[:, None], m.dtdy[:, None])
        elif cfg.scheme == "fv":
            step = lambda q, uu, vv: adv.fv_advect_2d(
                q, uu, vv, cfg.dt_dx, cfg.dt_dy)
        else:
            step = lambda q, uu, vv: adv.semi_lagrangian_2d(
                q, uu, vv, cfg.dt_dx, cfg.dt_dy)
        out = jax.vmap(step, in_axes=2, out_axes=2)(fg, ug, vg)
        return adv.to_columns(out, self.scatter_idx)

    def advect_all(self, fields: dict, u: jnp.ndarray, v: jnp.ndarray):
        """Transport every [ncol, nlev] field in ``fields`` with the same
        winds. With ``cfg.use_pallas`` the fused multi-tracer stencil runs
        one kernel per level (u/v loaded once for all tracers); otherwise
        falls back to per-field :meth:`advect`."""
        cfg = self.cfg
        if cfg.scheme == "none":
            return dict(fields)
        if not (cfg.use_pallas and cfg.scheme == "fv"):
            return {k: self.advect(f, u, v) for k, f in fields.items()}
        from ..ops import fv_advect_tracers, fv_advect_tracers_sphere
        names = list(fields)
        tg = lambda a: adv.to_grid(a, self.gather_idx, cfg.nlat,
                                   cfg.nlon).transpose(2, 0, 1)
        qs = jnp.stack([tg(fields[k]) for k in names])  # [ntrac,L,nlat,nlon]
        if self.metric is not None:
            out = fv_advect_tracers_sphere(qs, tg(u), tg(v), self.metric)
        else:
            out = fv_advect_tracers(qs, tg(u), tg(v), cfg.dt_dx, cfg.dt_dy)
        return {k: adv.to_columns(out[i].transpose(1, 2, 0),
                                  self.scatter_idx)
                for i, k in enumerate(names)}

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
            if self.metric is not None:
                omega = adv.diagnose_omega(
                    u, v, 1.0, 1.0, dp, self.gather_idx, self.scatter_idx,
                    cfg.nlat, cfg.nlon, metric=self.metric)
            else:
                omega = adv.diagnose_omega(
                    u * (dt / cfg.dx), v * (dt / cfg.dy), 1.0, 1.0, dp,
                    self.gather_idx, self.scatter_idx, cfg.nlat, cfg.nlon)
            T = adv.vertical_advect_column(T, omega, dp, 1.0)
            qv = adv.vertical_advect_column(qv, omega, dp, 1.0)
            qc = adv.vertical_advect_column(qc, omega, dp, 1.0)
            qi = adv.vertical_advect_column(qi, omega, dp, 1.0)

        # horizontal transport by the updated winds (fused over fields)
        adv_out = self.advect_all(
            {"T": T, "qv": qv, "qc": qc, "qi": qi, "u": u, "v": v}, u, v)
        T_a, qv_a, qc_a = adv_out["T"], adv_out["qv"], adv_out["qc"]
        qi_a, u_a, v_a = adv_out["qi"], adv_out["u"], adv_out["v"]

        if cfg.fix_water and cfg.scheme != "none":
            # PHYSICAL-units column mass: dp/g x per-column area weight
            # (the reference weights every integral by real cell areas,
            # climsim_utils/data_utils.py:74)
            w = self.grid.mass_weights(x_sfc[:, 0])  # dp/g from raw ps
            if self.area_wgt is not None:
                w = w * self.area_wgt[:, None]
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


def sharded_hybrid_step(loop: HybridLoop, mesh, axis: str = "col",
                        overlap: bool = True):
    """Multi-chip coupled step: proxy-grid fields latitude-sharded over the
    mesh; the emulator runs column-local inside shard_map while the FV
    stencil pulls its 2 ghost rows via ppermute (parallel.halo). Returns a
    jitted fn over grid-layout state dicts [nlat, nlon, nlev].

    ``overlap=True`` (default) moves the halo exchange OFF the critical
    path: the ppermutes transfer the *inputs* (state/sfc/memory ghost
    rows), which have no data dependency on the emulator, so XLA's
    latency-hiding scheduler runs them concurrently with the bulk
    emulator compute; the shard then redundantly evaluates the emulator
    on its 4 ghost rows (2·2/nlat_local extra work) and feeds the stencil
    a fully updated extended domain with no post-emulator exchange.
    Bit-identical to ``overlap=False`` (the emulator is column-local and
    deterministic, so recomputing a neighbor's boundary tendencies equals
    receiving them).
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    from ..parallel.halo import exchange_halo

    cfg = loop.cfg
    FIELDS = ("T", "qv", "qc", "qi", "u", "v")

    def _updates(state_like, ptend):
        dt = cfg.dt
        return {
            "T": state_like["T"] + dt * ptend[..., 0],
            "qv": jnp.maximum(state_like["qv"] + dt * ptend[..., 1], 0.0),
            "qc": jnp.maximum(state_like["qc"] + dt * ptend[..., 2], 0.0),
            "qi": jnp.maximum(state_like["qi"] + dt * ptend[..., 3], 0.0),
            "u": state_like["u"] + dt * ptend[..., 4],
            "v": state_like["v"] + dt * ptend[..., 5],
        }

    metric = loop.metric

    def local_step(state_g, mem, x_sfc_g):
        # state_g: [nlat_local, nlon, nlev] per field
        nlat_l, nlon, nlev = state_g["T"].shape
        flat = lambda a: a.reshape(nlat_l * nlon, *a.shape[2:])

        idx = jax.lax.axis_index(axis)
        nsh = jax.lax.axis_size(axis)
        is_south = idx == 0
        is_north = idx == nsh - 1
        row0 = idx * nlat_l      # first global row owned by this shard

        if overlap:
            # 1. kick off the input halo exchange — independent of the
            # emulator, so it overlaps with step 2
            ext = {k: exchange_halo(state_g[k], axis, 2) for k in FIELDS}
            sfc_ext = exchange_halo(x_sfc_g, axis, 2)
            # mem is column-flat [nlat_l*nlon, ...]: lift to rows for the
            # halo exchange
            mem_ext = exchange_halo(
                mem.reshape((nlat_l, nlon) + mem.shape[1:]), axis, 2)

        # 2. bulk emulator on the local columns
        x_main = jnp.stack([flat(state_g[k]) for k in FIELDS], axis=-1)
        ptend, sfc_fluxes, mem_new = loop.emulator(x_main, flat(x_sfc_g),
                                                   mem)
        ptend = ptend.reshape(nlat_l, nlon, nlev, 6)

        upd = _updates(state_g, ptend)

        if overlap:
            # 3. ghost-row emulator (2 rows each side): recompute the
            # neighbors' boundary tendencies locally instead of waiting
            # on a post-emulator exchange
            grows = lambda e: jnp.concatenate([e[:2], e[-2:]], axis=0)
            gflat = lambda a: a.reshape((4 * nlon,) + a.shape[2:])
            xg = jnp.stack([gflat(grows(ext[k])) for k in FIELDS],
                           axis=-1)
            ptend_g, _, _ = loop.emulator(xg, gflat(grows(sfc_ext)),
                                          gflat(grows(mem_ext)))
            ptend_g = ptend_g.reshape(4, nlon, nlev, 6)
            gstate = {k: grows(ext[k]) for k in FIELDS}
            gupd = _updates(gstate, ptend_g)
            upd_ext = {k: jnp.concatenate(
                [gupd[k][:2], upd[k], gupd[k][2:]], axis=0)
                for k in FIELDS}
            u_ext, v_ext = upd_ext["u"], upd_ext["v"]
            get_ext = lambda k: upd_ext[k]
        else:
            u_ext = exchange_halo(upd["u"], axis, 2)
            v_ext = exchange_halo(upd["v"], axis, 2)
            get_ext = lambda k: exchange_halo(upd[k], axis, 2)

        def advect_field(f_ext):
            if metric is not None:
                step1 = lambda q, uu, vv: adv.fv_advect_2d_sphere_halo(
                    q, uu, vv, metric, row0)
            else:
                step1 = lambda q, uu, vv: adv.fv_advect_2d_halo(
                    q, uu, vv, cfg.dt_dx, cfg.dt_dy, is_south, is_north)
            return jax.vmap(step1, in_axes=2, out_axes=2)(f_ext, u_ext,
                                                          v_ext)

        out = {k: advect_field(get_ext(k)) for k in FIELDS}
        diags = {"mean_T": jax.lax.pmean(jnp.mean(out["T"]), axis)}
        return out, mem_new, diags

    from jax.sharding import PartitionSpec as P
    state_spec = {k: P(axis) for k in ("T", "qv", "qc", "qi", "u", "v")}
    fn = shard_map(local_step, mesh=mesh,
                   in_specs=(state_spec, P(axis), P(axis)),
                   out_specs=(state_spec, P(axis), P()))
    return jax.jit(fn)
