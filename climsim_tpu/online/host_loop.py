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


def _energy_integral(T, qc, qi, w):
    """Global moist-energy integral sum(w * (cp*T - Lv*qc - Ls*qi)) — the
    state-level twin of the reference's column energy residual
    (rnn/metrics.py:197-238: heating vs latent heat of the condensate),
    with w = dp/g x area weight."""
    return jnp.sum(w * (C.CP * T - C.LV * qc - C.LSUB * qi))


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
    # energy-conservation epilogue: additive uniform temperature shift that
    # restores the global moist-energy integral sum(w*(cp*T - Lv*qc - Ls*qi))
    # across the transport step (incl. what the water fixer moved) — the
    # differentiable twin of the reference's column energy residual
    # (rnn/metrics.py:193-239) acting on the host state
    fix_energy: bool = False
    # Channel-major emulator contract: the emulator takes
    # x_main [L, nx, B] and mem [L, nm, B] and returns ptend [L, 6, B] /
    # mem [L, nm, B] (x_sfc/fluxes stay batch-major). Narrow
    # [., ., c<128] arrays are 128-lane padded on TPU, so the batch-major
    # contract makes every narrow activation around the fused kernel
    # cost ~20x its logical bytes — measured 16.4 -> 34.8 ms on the
    # 21,600-column coupled step. Channel-major puts the batch dim on
    # the lanes: zero padding, dense per-channel slices. Pair with
    # RNNAutoreg(level_major=True).
    emulator_level_major: bool = False
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
        lm = cfg.emulator_level_major
        if self.feature_builder is not None:
            # with emulator_level_major the builder must return
            # x_main_raw [L, nx, B] (channel-major contract)
            x_main_raw, x_sfc = self.feature_builder(state, x_sfc_raw)
        else:
            fields = (state["T"], state["qv"], state["qc"], state["qi"],
                      state["u"], state["v"])
            if lm:
                x_main_raw = jnp.stack([f.T for f in fields], axis=1)
            else:
                x_main_raw = jnp.stack(fields, axis=-1)
            x_sfc = x_sfc_raw

        ptend, sfc_fluxes, mem = self.emulator(x_main_raw, x_sfc, mem)

        # channel j of the physics tendencies as [ncol, nlev]
        pt = (lambda j: ptend[:, j, :].T) if lm else \
            (lambda j: ptend[:, :, j])

        dt = cfg.dt
        T = state["T"] + dt * pt(0)
        qv = jnp.maximum(state["qv"] + dt * pt(1), 0.0)
        qc = jnp.maximum(state["qc"] + dt * pt(2), 0.0)
        qi = jnp.maximum(state["qi"] + dt * pt(3), 0.0)
        u = state["u"] + dt * pt(4)
        v = state["v"] + dt * pt(5)

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

        w = None
        if (cfg.fix_water or cfg.fix_energy) and cfg.scheme != "none":
            # PHYSICAL-units column mass: dp/g x per-column area weight
            # (the reference weights every integral by real cell areas,
            # climsim_utils/data_utils.py:74)
            w = self.grid.mass_weights(x_sfc[:, 0])  # dp/g from raw ps
            if self.area_wgt is not None:
                w = w * self.area_wgt[:, None]

        if cfg.fix_water and cfg.scheme != "none":
            qv_a = adv.conservation_fixer(qv_a, qv, w)
            qc_a = adv.conservation_fixer(qc_a, qc, w)
            qi_a = adv.conservation_fixer(qi_a, qi, w)

        if cfg.fix_energy and cfg.scheme != "none":
            # additive uniform dT restoring the pre-transport moist energy
            # integral (differentiable; exact by construction)
            e_pre = _energy_integral(T, qc, qi, w)
            e_post = _energy_integral(T_a, qc_a, qi_a, w)
            T_a = T_a + (e_pre - e_post) / (C.CP * jnp.sum(w))

        new_state = {"T": T_a, "qv": qv_a, "qc": qc_a, "qi": qi_a,
                     "u": u_a, "v": v_a}
        diags = {"sfc_fluxes": sfc_fluxes,
                 "precc": sfc_fluxes[:, 3],
                 "mean_T": jnp.mean(T_a)}
        if w is not None:
            # reference-form physics energy residual of THIS step's emulator
            # tendencies (rnn/metrics.py:197-238), area-mass weighted mean,
            # and the state's global moist-energy integral — both feed the
            # long-run stability diagnostics
            snow = 1000.0 * sfc_fluxes[:, 2]
            rain = 1000.0 * sfc_fluxes[:, 3] - snow
            col = jnp.sum(w * (C.CP * pt(0) - C.LV * pt(2)
                               - C.LSUB * pt(3)), axis=1)
            diags["energy_resid"] = jnp.mean(col - C.LV * rain
                                             - C.LSUB * snow)
            diags["energy_int"] = _energy_integral(T_a, qc_a, qi_a, w)
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
    """Multi-chip coupled step at PRODUCTION parity with
    :meth:`HybridLoop.coupled_step`: proxy-grid fields latitude-sharded
    over the mesh; the emulator runs column-local inside shard_map; the
    advection stencil (FV or semi-Lagrangian, flat or spherical metric)
    pulls its 2 ghost rows via ppermute (parallel.halo); vertical
    advection diagnoses omega from halo-exchanged updated winds; and the
    water/energy conservation epilogues close their global integrals with
    ``psum`` collectives (the reference's area x dp/g weighting,
    climsim_utils/data_utils.py:74,1523-1725). Returns a jitted fn over
    grid-layout state dicts [nlat, nlon, nlev].

    ``overlap=True`` (default) moves the halo exchange OFF the critical
    path: the ppermutes transfer the *inputs* (state/sfc/memory ghost
    rows), which have no data dependency on the emulator, so XLA's
    latency-hiding scheduler runs them concurrently with the bulk
    emulator compute; the shard then redundantly evaluates the emulator
    on its 4 ghost rows (2·2/nlat_local extra work) and feeds the stencil
    a fully updated extended domain with no post-emulator exchange.
    Bit-identical to ``overlap=False`` (the emulator is column-local and
    deterministic, so recomputing a neighbor's boundary tendencies equals
    receiving them). With ``vertical_advection`` the overlap shortcut is
    disabled (ghost-row omega would need halo-3 winds); the exchange then
    happens after the vertical transport, exactly as the single-device
    ordering requires.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    from ..parallel.halo import exchange_halo

    cfg = loop.cfg
    FIELDS = ("T", "qv", "qc", "qi", "u", "v")
    metric = loop.metric
    grid = loop.grid
    use_overlap = overlap and not cfg.vertical_advection

    # static grid-layout per-cell area weights (sharded along rows below)
    gather_np = np.asarray(loop.gather_idx)
    if loop.area_wgt is not None:
        aw_full = jnp.asarray(np.asarray(loop.area_wgt)[gather_np]
                              .reshape(cfg.nlat, cfg.nlon))
    else:
        aw_full = jnp.ones((cfg.nlat, cfg.nlon), jnp.float32)

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

    def _metric_rows(arr_np, row0, n, pad):
        """Slice a global per-row metric array to this shard's rows
        (edge-padded by ``pad`` ghost entries)."""
        padded = jnp.asarray(np.pad(arr_np, pad, mode="edge"))
        return jax.lax.dynamic_slice(padded, (row0,), (n + 2 * pad,))

    def _vertical_advect(upd, dp_g, row0):
        """Omega-diagnosed conservative vertical transport of the updated
        thermodynamic fields — the sharded twin of the
        cfg.vertical_advection branch of coupled_step (halo-1 exchange of
        the updated winds feeds the centered divergence; clamped ghosts at
        the global edges reproduce diagnose_omega's one-sided clampdiff)."""
        nlat_l, nlon, nlev = upd["T"].shape
        if metric is not None:
            u_e = exchange_halo(upd["u"], axis, 1)
            v_e = exchange_halo(upd["v"], axis, 1)
            dtdx = _metric_rows(metric.dtdx, row0, nlat_l, 0)[:, None, None]
            dtdy = _metric_rows(metric.dtdy, row0, nlat_l, 0)[:, None, None]
            cosc = _metric_rows(metric.cosc, row0, nlat_l, 1)[:, None, None]
            dudx = (jnp.roll(u_e[1:-1], -1, axis=1)
                    - jnp.roll(u_e[1:-1], 1, axis=1)) * 0.5 * dtdx
            vcos = v_e * cosc
            dvdy = (vcos[2:] - vcos[:-2]) * 0.5 * dtdy / cosc[1:-1]
        else:
            u_e = exchange_halo(upd["u"] * cfg.dt_dx, axis, 1)
            v_e = exchange_halo(upd["v"] * cfg.dt_dy, axis, 1)
            dudx = (jnp.roll(u_e[1:-1], -1, axis=1)
                    - jnp.roll(u_e[1:-1], 1, axis=1)) * 0.5
            dvdy = (v_e[2:] - v_e[:-2]) * 0.5
        div = dudx + dvdy                                   # [nlat_l,nlon,L]
        col_int = jnp.cumsum(div * dp_g, axis=-1)
        zero = jnp.zeros_like(col_int[..., :1])
        omega = -jnp.concatenate([zero, col_int], axis=-1)  # [.., L+1]
        flat = lambda a: a.reshape(nlat_l * nlon, a.shape[-1])
        unflat = lambda a: a.reshape(nlat_l, nlon, nlev)
        of, dpf = flat(omega), flat(dp_g)
        out = dict(upd)
        for k in ("T", "qv", "qc", "qi"):
            out[k] = unflat(adv.vertical_advect_column(flat(upd[k]), of,
                                                       dpf, 1.0))
        return out

    def local_step(state_g, mem, x_sfc_g, aw_g):
        # state_g: [nlat_local, nlon, nlev] per field
        nlat_l, nlon, nlev = state_g["T"].shape
        flat = lambda a: a.reshape(nlat_l * nlon, *a.shape[2:])

        idx = jax.lax.axis_index(axis)
        nsh = jax.lax.axis_size(axis)
        is_south = idx == 0
        is_north = idx == nsh - 1
        row0 = idx * nlat_l      # first global row owned by this shard

        if use_overlap:
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

        ps = flat(x_sfc_g)[:, 0]
        w = None
        if (cfg.fix_water or cfg.fix_energy) and cfg.scheme != "none":
            w = grid.mass_weights(ps).reshape(nlat_l, nlon, nlev) \
                * aw_g[:, :, None]

        if cfg.vertical_advection and cfg.scheme != "none":
            dp_g = grid.layer_thickness(ps).reshape(nlat_l, nlon, nlev)
            upd = _vertical_advect(upd, dp_g, row0)

        if cfg.scheme == "none":
            out = dict(upd)
        else:
            if use_overlap:
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
            else:
                upd_ext = {k: exchange_halo(upd[k], axis, 2)
                           for k in FIELDS}
            u_ext, v_ext = upd_ext["u"], upd_ext["v"]

            if cfg.scheme == "fv":
                if metric is not None:
                    step1 = lambda q, uu, vv: adv.fv_advect_2d_sphere_halo(
                        q, uu, vv, metric, row0)
                else:
                    step1 = lambda q, uu, vv: adv.fv_advect_2d_halo(
                        q, uu, vv, cfg.dt_dx, cfg.dt_dy, is_south,
                        is_north)
            else:   # semi_lagrangian
                if metric is not None:
                    dtdx_r = _metric_rows(metric.dtdx, row0, nlat_l,
                                          2)[:, None]
                    dtdy_r = _metric_rows(metric.dtdy, row0, nlat_l,
                                          2)[:, None]
                else:
                    dtdx_r = jnp.full((nlat_l + 4, 1), cfg.dt_dx)
                    dtdy_r = jnp.full((nlat_l + 4, 1), cfg.dt_dy)
                step1 = lambda q, uu, vv: adv.semi_lagrangian_2d_halo(
                    q, uu, vv, dtdx_r, dtdy_r, row0, cfg.nlat)
            advect_field = lambda f_ext: jax.vmap(
                step1, in_axes=2, out_axes=2)(f_ext, u_ext, v_ext)
            out = {k: advect_field(upd_ext[k]) for k in FIELDS}

        psum = lambda s: jax.lax.psum(s, axis)
        if cfg.fix_water and cfg.scheme != "none":
            # psum'd twin of advection.conservation_fixer
            for k in ("qv", "qc", "qi"):
                qn = jnp.maximum(out[k], 0.0)
                tot_old = psum(jnp.sum(upd[k] * w))
                tot_new = psum(jnp.sum(qn * w))
                out[k] = qn * (tot_old / jnp.maximum(tot_new, 1e-30))

        if cfg.fix_energy and cfg.scheme != "none":
            e_pre = psum(_energy_integral(upd["T"], upd["qc"], upd["qi"],
                                          w))
            e_post = psum(_energy_integral(out["T"], out["qc"], out["qi"],
                                           w))
            out["T"] = out["T"] + (e_pre - e_post) / (C.CP
                                                      * psum(jnp.sum(w)))

        diags = {"mean_T": jax.lax.pmean(jnp.mean(out["T"]), axis)}
        if w is not None:
            snow = 1000.0 * sfc_fluxes[:, 2]
            rain = 1000.0 * sfc_fluxes[:, 3] - snow
            wf = w.reshape(nlat_l * nlon, nlev)
            col = jnp.sum(wf * (C.CP * flat(ptend)[:, :, 0]
                                - C.LV * flat(ptend)[:, :, 2]
                                - C.LSUB * flat(ptend)[:, :, 3]), axis=1)
            diags["energy_resid"] = jax.lax.pmean(
                jnp.mean(col - C.LV * rain - C.LSUB * snow), axis)
            diags["energy_int"] = psum(
                _energy_integral(out["T"], out["qc"], out["qi"], w))
        return out, mem_new, diags

    state_spec = {k: P(axis) for k in FIELDS}
    fn = shard_map(local_step, mesh=mesh,
                   in_specs=(state_spec, P(axis), P(axis), P(axis)),
                   out_specs=(state_spec, P(axis), P()))
    return jax.jit(lambda state_g, mem, x_sfc_g: fn(state_g, mem, x_sfc_g,
                                                    aw_full))
