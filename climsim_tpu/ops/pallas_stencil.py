"""Pallas finite-volume advection stencil kernel.

The online host loop's transport operator (online/advection.py) as a TPU
kernel: one program per level performs the full dimensionally-split
MC-limited FV update for a [nlat, nlon] field entirely in VMEM — zonal
sweep, meridional sweep, flux assembly — so the intermediate post-zonal
field never touches HBM. Semantics match ``fv_advect_2d`` exactly (pinned
by parity tests).

For the ClimSim grids a whole level field is tiny (low-res 16x24, high-res
~120x180 per shard), so the kernel is HBM-bandwidth bound on the (q, u, v)
loads per level; fusing both sweeps halves the traffic vs a two-pass
elementwise implementation.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mc_slope(qm, q0, qp):
    dqc = 0.5 * (qp - qm)
    dqp = qp - q0
    dqm = q0 - qm
    s = jnp.sign(dqc)
    mag = jnp.minimum(jnp.abs(dqc),
                      2.0 * jnp.minimum(jnp.abs(dqp), jnp.abs(dqm)))
    return jnp.where(dqp * dqm > 0.0, s * mag, 0.0)


def _fv_level_kernel(q_ref, u_ref, v_ref, out_ref, *, dt_dx: float,
                     dt_dy: float):
    """One [1, nlat, nlon] level block: zonal (periodic) then meridional
    (clamped poles, zero pole flux) sweep, all in VMEM."""
    q = q_ref[0]
    u = u_ref[0]
    v = v_ref[0]

    # ---- zonal sweep (periodic in the lon axis)
    qm = pltpu.roll(q, 1, 1)
    qmm = pltpu.roll(q, 2, 1)
    nlon = q.shape[1]
    qp = pltpu.roll(q, nlon - 1, 1)
    slope_m = _mc_slope(qmm, qm, q)
    slope_0 = _mc_slope(qm, q, qp)
    c = u * dt_dx
    f_pos = qm + 0.5 * (1.0 - c) * slope_m
    f_neg = q - 0.5 * (1.0 + c) * slope_0
    F = jnp.where(u >= 0.0, u * f_pos, u * f_neg)
    # advective (free-stream-preserving) form as in online/advection.py:
    # subtract q times the constant-field flux divergence
    q = q - dt_dx * ((pltpu.roll(F, nlon - 1, 1) - F)
                     - q * (pltpu.roll(u, nlon - 1, 1) - u))

    # ---- meridional sweep (clamped ghost rows; zero pole-face fluxes)
    nlat = q.shape[0]
    ext = jnp.concatenate([q[:1], q[:1], q, q[-1:], q[-1:]], axis=0)
    v_ext = jnp.concatenate([v[:1], v[:1], v, v[-1:], v[-1:]], axis=0)
    qmm = ext[:-3]          # rows j-2 for faces j = 0..nlat
    qm = ext[1:-2]
    q0 = ext[2:-1]
    qp = ext[3:]
    vf = v_ext[2:-1]        # face velocity from the cell below the face
    slope_m = _mc_slope(qmm, qm, q0)
    slope_0 = _mc_slope(qm, q0, qp)
    c = vf * dt_dy
    f_pos = qm + 0.5 * (1.0 - c) * slope_m
    f_neg = q0 - 0.5 * (1.0 + c) * slope_0
    faces = jnp.where(vf >= 0.0, vf * f_pos, vf * f_neg)  # [nlat+1, nlon]
    row = jax.lax.broadcasted_iota(jnp.int32, faces.shape, 0)
    pole = (row == 0) | (row == nlat)
    faces = jnp.where(pole, 0.0, faces)
    vfm = jnp.where(pole, 0.0, vf)
    out_ref[0] = q - dt_dy * ((faces[1:] - faces[:-1])
                              - q * (vfm[1:] - vfm[:-1]))


def fv_advect_levels(q: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray,
                     dt_dx: float, dt_dy: float,
                     interpret: bool = False) -> jnp.ndarray:
    """Batched FV transport: q/u/v [nlev, nlat, nlon] -> advected q.
    One pallas program per level, whole level field resident in VMEM."""
    nlev, nlat, nlon = q.shape
    spec = pl.BlockSpec((1, nlat, nlon), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    kern = functools.partial(_fv_level_kernel, dt_dx=dt_dx, dt_dy=dt_dy)
    return pl.pallas_call(
        kern,
        grid=(nlev,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(q, u, v)


# --------------------------------------------------------------------------
# multi-tracer fused kernel: advect every prognostic field with one (u, v)
# load per level. The per-field form pays 3 loads + 1 store per tracer;
# fusing all ntrac tracers into one program costs (ntrac + 2) loads +
# ntrac stores — for the host loop's 6 fields that halves HBM traffic.
# --------------------------------------------------------------------------

def _fv_tracers_kernel(q_ref, u_ref, v_ref, out_ref, *, dt_dx: float,
                       dt_dy: float):
    """One level, all tracers: q_ref [ntrac, 1, nlat, nlon],
    u/v_ref [1, nlat, nlon]."""
    q = q_ref[:, 0]                 # [ntrac, nlat, nlon]
    u = u_ref[0]                    # [nlat, nlon]
    v = v_ref[0]

    # ---- zonal sweep (periodic lon = last axis), broadcast over tracers
    nlon = q.shape[-1]
    qm = pltpu.roll(q, 1, 2)
    qmm = pltpu.roll(q, 2, 2)
    qp = pltpu.roll(q, nlon - 1, 2)
    slope_m = _mc_slope(qmm, qm, q)
    slope_0 = _mc_slope(qm, q, qp)
    c = u * dt_dx
    f_pos = qm + 0.5 * (1.0 - c) * slope_m
    f_neg = q - 0.5 * (1.0 + c) * slope_0
    F = jnp.where(u >= 0.0, u * f_pos, u * f_neg)
    # advective form (see online/advection.py): constant-field correction
    q = q - dt_dx * ((pltpu.roll(F, nlon - 1, 2) - F)
                     - q * (pltpu.roll(u, nlon - 1, 1) - u))

    # ---- meridional sweep (clamped ghost rows; zero pole-face fluxes)
    nlat = q.shape[1]
    ext = jnp.concatenate([q[:, :1], q[:, :1], q, q[:, -1:], q[:, -1:]],
                          axis=1)
    v_ext = jnp.concatenate([v[:1], v[:1], v, v[-1:], v[-1:]], axis=0)
    qmm = ext[:, :-3]
    qm = ext[:, 1:-2]
    q0 = ext[:, 2:-1]
    qp = ext[:, 3:]
    vf = v_ext[2:-1]                # [nlat+1, nlon]
    slope_m = _mc_slope(qmm, qm, q0)
    slope_0 = _mc_slope(qm, q0, qp)
    c = vf * dt_dy
    f_pos = qm + 0.5 * (1.0 - c) * slope_m
    f_neg = q0 - 0.5 * (1.0 + c) * slope_0
    faces = jnp.where(vf >= 0.0, vf * f_pos, vf * f_neg)
    row = jax.lax.broadcasted_iota(jnp.int32, faces.shape, 1)
    faces = jnp.where((row == 0) | (row == nlat), 0.0, faces)
    # constant-field face flux: vf with the same pole closure ([nlat+1,
    # nlon], lat axis 0 — broadcasts over the tracer axis of q)
    vrow = jax.lax.broadcasted_iota(jnp.int32, vf.shape, 0)
    vfm = jnp.where((vrow == 0) | (vrow == nlat), 0.0, vf)
    out_ref[:, 0] = q - dt_dy * ((faces[:, 1:] - faces[:, :-1])
                                 - q * (vfm[1:] - vfm[:-1]))


def _fv_advect_tracers_fwd_impl(qs, u, v, dt_dx, dt_dy, interpret):
    ntrac, nlev, nlat, nlon = qs.shape
    qspec = pl.BlockSpec((ntrac, 1, nlat, nlon), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((1, nlat, nlon), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    kern = functools.partial(_fv_tracers_kernel, dt_dx=dt_dx, dt_dy=dt_dy)
    return pl.pallas_call(
        kern,
        grid=(nlev,),
        in_specs=[qspec, wspec, wspec],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct(qs.shape, qs.dtype),
        interpret=interpret,
    )(qs, u, v)


def _fv_reference(qs, u, v, dt_dx, dt_dy):
    """jnp reference (the backward-pass implementation): vmap the online
    FV step over (tracer, level)."""
    from ..online.advection import fv_advect_2d
    step = lambda q, uu, vv: fv_advect_2d(q, uu, vv, dt_dx, dt_dy)
    per_level = jax.vmap(step)                       # over levels
    return jax.vmap(lambda qt: per_level(qt, u, v))(qs)   # over tracers


def _on_tpu() -> bool:
    from . import on_tpu
    return on_tpu()


def _fv_tracers_primal(qs, u, v, dt_dx, dt_dy):
    if _on_tpu():
        return _fv_advect_tracers_fwd_impl(qs, u, v, dt_dx, dt_dy, False)
    return _fv_reference(qs, u, v, dt_dx, dt_dy)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fv_advect_tracers(qs: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray,
                      dt_dx: float, dt_dy: float) -> jnp.ndarray:
    """Fused multi-tracer FV transport: qs [ntrac, nlev, nlat, nlon]
    advected by u/v [nlev, nlat, nlon]. Pallas forward on TPU (jnp
    reference elsewhere); the backward pass differentiates the jnp
    reference (exact, XLA-fused), so online rollout training through the
    host loop stays differentiable."""
    return _fv_tracers_primal(qs, u, v, dt_dx, dt_dy)


def _fv_tracers_fwd(qs, u, v, dt_dx, dt_dy):
    return _fv_tracers_primal(qs, u, v, dt_dx, dt_dy), (qs, u, v)


def _fv_tracers_bwd(dt_dx, dt_dy, res, ct):
    qs, u, v = res
    _, vjp = jax.vjp(lambda a, b, c: _fv_reference(a, b, c, dt_dx, dt_dy),
                     qs, u, v)
    return vjp(ct)


fv_advect_tracers.defvjp(_fv_tracers_fwd, _fv_tracers_bwd)


# --------------------------------------------------------------------------
# spherical-metric variant: same fused multi-tracer program with per-row
# metric factors (online/advection.SphericalMetric) resident in VMEM —
# real-geography dx = a cos(phi) dlon, cos(phi) face weights, exact pole
# closure, courant clamping for the thin polar rows.
# --------------------------------------------------------------------------

def _fv_tracers_sphere_kernel(q_ref, u_ref, v_ref, dtdx_ref, cf_ref,
                              wf_ref, wc_ref, out_ref, *, cfl: float):
    """One level, all tracers on the sphere: q_ref [ntrac, 1, nlat, nlon],
    u/v_ref [1, nlat, nlon], metric rows [nlat, 1] / faces [nlat+1, 1]."""
    q = q_ref[:, 0]                 # [ntrac, nlat, nlon]
    u = u_ref[0]                    # [nlat, nlon]
    v = v_ref[0]
    dtdx = dtdx_ref[...]            # [nlat, 1] broadcasts over lon
    cf_fac = cf_ref[...]            # [nlat+1, 1]
    wf = wf_ref[...]                # [nlat+1, 1]
    wc = wc_ref[...]                # [nlat, 1]

    # ---- zonal sweep in courant units (per-row dtdx, clamped)
    nlon = q.shape[-1]
    qm = pltpu.roll(q, 1, 2)
    qmm = pltpu.roll(q, 2, 2)
    qp = pltpu.roll(q, nlon - 1, 2)
    slope_m = _mc_slope(qmm, qm, q)
    slope_0 = _mc_slope(qm, q, qp)
    c = jnp.clip(u * dtdx, -cfl, cfl)
    f_pos = qm + 0.5 * (1.0 - c) * slope_m
    f_neg = q - 0.5 * (1.0 + c) * slope_0
    Fc = jnp.where(c >= 0.0, c * f_pos, c * f_neg)
    # advective form (see online/advection.py): constant-field flux is c
    q = q - ((pltpu.roll(Fc, nlon - 1, 2) - Fc)
             - q * (pltpu.roll(c, nlon - 1, 1) - c))

    # ---- meridional sweep with cos(phi) face weights
    ext = jnp.concatenate([q[:, :1], q[:, :1], q, q[:, -1:], q[:, -1:]],
                          axis=1)
    v_ext = jnp.concatenate([v[:1], v[:1], v, v[-1:], v[-1:]], axis=0)
    qmm = ext[:, :-3]
    qm = ext[:, 1:-2]
    q0 = ext[:, 2:-1]
    qp = ext[:, 3:]
    vf = v_ext[2:-1]                # [nlat+1, nlon]
    slope_m = _mc_slope(qmm, qm, q0)
    slope_0 = _mc_slope(qm, q0, qp)
    c = jnp.clip(vf * cf_fac, -cfl, cfl)
    f_pos = qm + 0.5 * (1.0 - c) * slope_m
    f_neg = q0 - 0.5 * (1.0 + c) * slope_0
    faces = jnp.where(c >= 0.0, c * f_pos, c * f_neg)
    flux = wf * faces               # pole faces: wf = cos(+-90) dphi = 0
    fluxc = wf * c                  # constant-field flux [nlat+1, nlon]
    out_ref[:, 0] = q - wc * ((flux[:, 1:] - flux[:, :-1])
                              - q * (fluxc[1:] - fluxc[:-1]))


def _fv_sphere_fwd_impl(qs, u, v, m, interpret):
    ntrac, nlev, nlat, nlon = qs.shape
    qspec = pl.BlockSpec((ntrac, 1, nlat, nlon), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((1, nlat, nlon), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    rspec = pl.BlockSpec((nlat, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    fspec = pl.BlockSpec((nlat + 1, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    kern = functools.partial(_fv_tracers_sphere_kernel, cfl=m.cfl_max)
    col = lambda a: jnp.asarray(a).reshape(-1, 1)
    return pl.pallas_call(
        kern,
        grid=(nlev,),
        in_specs=[qspec, wspec, wspec, rspec, fspec, fspec, rspec],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct(qs.shape, qs.dtype),
        interpret=interpret,
    )(qs, u, v, col(m.dtdx), col(m.cf_fac), col(m.wf), col(m.wc))


def _fv_sphere_reference(qs, u, v, m):
    from ..online.advection import fv_advect_2d_sphere
    step = lambda q, uu, vv: fv_advect_2d_sphere(q, uu, vv, m)
    per_level = jax.vmap(step)
    return jax.vmap(lambda qt: per_level(qt, u, v))(qs)


def _fv_sphere_primal(qs, u, v, m):
    if _on_tpu():
        return _fv_sphere_fwd_impl(qs, u, v, m, False)
    return _fv_sphere_reference(qs, u, v, m)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fv_advect_tracers_sphere(qs: jnp.ndarray, u: jnp.ndarray,
                             v: jnp.ndarray, m) -> jnp.ndarray:
    """Fused multi-tracer spherical FV transport: qs [ntrac, nlev, nlat,
    nlon] advected by u/v [nlev, nlat, nlon] in m/s with the per-row
    metric ``m`` (online.advection.SphericalMetric). Pallas forward on
    TPU; backward differentiates the jnp reference."""
    return _fv_sphere_primal(qs, u, v, m)


def _fv_sphere_fwd(qs, u, v, m):
    return _fv_sphere_primal(qs, u, v, m), (qs, u, v)


def _fv_sphere_bwd(m, res, ct):
    qs, u, v = res
    _, vjp = jax.vjp(lambda a, b, c: _fv_sphere_reference(a, b, c, m),
                     qs, u, v)
    return vjp(ct)


fv_advect_tracers_sphere.defvjp(_fv_sphere_fwd, _fv_sphere_bwd)
