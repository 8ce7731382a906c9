"""Finite-volume tracer advection + semi-Lagrangian transport stencils.

The host-dynamics operator that replaces the reference's external Fortran
E3SM dynamical core in the online hybrid loop (SURVEY.md §3.4; the
reference itself contains no advection code — its online path calls the
emulator from Fortran via FTorch, online_testing/README.md §5).

Design: ClimSim's ne4pg2 grid (384 unstructured columns) is mapped once to
a structured [nlat, nlon] proxy grid (sorted by latitude bands then
longitude — data_utils keeps the same lat/lon sort keys,
climsim_utils/data_utils.py:84-88). Dynamics then operates per vertical
level on [nlat, nlon] fields:

* :func:`fv_advect_2d` — conservative finite-volume transport with van Leer
  (MC-limited) reconstruction, dimensionally split, periodic in longitude
  and clamped at the poles;
* :func:`semi_lagrangian_2d` — back-trajectory + bilinear interpolation
  (non-conservative, unconditionally stable for long steps).

Both are pure jnp on [nlat(+halo), nlon] arrays so they vectorize over
(level, tracer) via vmap, run under jit, and shard over a mesh 'col' axis
with :mod:`climsim_tpu.parallel.halo` providing the latitude ghost rows
(2 rows for the limiter stencil).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def build_proxy_grid(lat: np.ndarray, lon: np.ndarray, nlat: int, nlon: int):
    """Assign each unstructured column to a [nlat, nlon] cell.

    Returns (gather_idx [nlat*nlon] column index per cell,
             scatter_idx [ncol] cell index per column).
    Columns are sorted into nlat latitude bands of equal count, then by
    longitude within each band; requires ncol == nlat*nlon.
    """
    ncol = lat.shape[0]
    assert ncol == nlat * nlon, (ncol, nlat, nlon)
    order = np.argsort(lat, kind="stable")
    gather = np.empty(ncol, np.int64)
    for b in range(nlat):
        band = order[b * nlon:(b + 1) * nlon]
        band = band[np.argsort(lon[band], kind="stable")]
        gather[b * nlon:(b + 1) * nlon] = band
    scatter = np.empty(ncol, np.int64)
    scatter[gather] = np.arange(ncol)
    return gather, scatter


def to_grid(x_col: jnp.ndarray, gather_idx, nlat: int, nlon: int):
    """[ncol, ...] -> [nlat, nlon, ...]."""
    return x_col[gather_idx].reshape((nlat, nlon) + x_col.shape[1:])


def to_columns(x_grid: jnp.ndarray, scatter_idx):
    """[nlat, nlon, ...] -> [ncol, ...]."""
    flat = x_grid.reshape((-1,) + x_grid.shape[2:])
    return flat[scatter_idx]


def _mc_limited_slope(qm, q0, qp):
    """Monotonized-central (van Leer) slope limiter."""
    dqc = 0.5 * (qp - qm)
    dqp = qp - q0
    dqm = q0 - qm
    s = jnp.sign(dqc)
    mag = jnp.minimum(jnp.abs(dqc),
                      2.0 * jnp.minimum(jnp.abs(dqp), jnp.abs(dqm)))
    return jnp.where(dqp * dqm > 0.0, s * mag, 0.0)


def _flux_1d(q, u, dt_dx):
    """Upwind van-Leer flux at interfaces of a periodic 1-D array.

    q, u: [n] cell values and interface-normal velocity at the *left* face
    of each cell (u[i] is the face between cell i-1 and i).
    Returns fluxes [n] with F[i] across that face.
    """
    qm = jnp.roll(q, 1)       # cell i-1
    qmm = jnp.roll(q, 2)
    qp = jnp.roll(q, -1)
    slope_m = _mc_limited_slope(qmm, qm, q)      # slope in cell i-1
    slope_0 = _mc_limited_slope(qm, q, qp)       # slope in cell i
    c = u * dt_dx
    # donor cell depends on sign: from cell i-1 if u>0 else from cell i
    q_face_pos = qm + 0.5 * (1.0 - c) * slope_m
    q_face_neg = q - 0.5 * (1.0 + c) * slope_0
    return jnp.where(u >= 0.0, u * q_face_pos, u * q_face_neg)


def fv_advect_2d(q: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray,
                 dt_dx: float, dt_dy: float) -> jnp.ndarray:
    """One dimensionally-split conservative FV step on [nlat, nlon].

    u: zonal velocity (periodic direction, axis 1), v: meridional (axis 0).
    dt_dx/dt_dy: timestep over cell size (CFL numbers at unit speed).
    Meridional boundary: zero-flux at the poles (rows 0 and -1).
    When called on a halo-extended array, slice the interior afterwards.
    """
    # single-device path = halo path with locally-built clamped ghost rows,
    # so sharded and unsharded execution are bit-identical
    ext = lambda a: jnp.concatenate([a[:1], a[:1], a, a[-1:], a[-1:]],
                                    axis=0)
    return fv_advect_2d_halo(ext(q), ext(u), ext(v), dt_dx, dt_dy,
                             is_south=True, is_north=True)


def semi_lagrangian_2d(q: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray,
                       dt_dx: float, dt_dy: float) -> jnp.ndarray:
    """Semi-Lagrangian transport: back-trajectory departure points +
    bilinear interpolation. Periodic in lon, clamped in lat."""
    nlat, nlon = q.shape
    i = jax.lax.broadcasted_iota(jnp.float32, (nlat, nlon), 0)
    j = jax.lax.broadcasted_iota(jnp.float32, (nlat, nlon), 1)
    dep_i = i - v * dt_dy
    dep_j = j - u * dt_dx
    i0 = jnp.clip(jnp.floor(dep_i), 0, nlat - 1)
    fi = dep_i - i0
    j0f = jnp.floor(dep_j)
    fj = dep_j - j0f
    i0 = i0.astype(jnp.int32)
    i1 = jnp.clip(i0 + 1, 0, nlat - 1)
    j0 = jnp.mod(j0f.astype(jnp.int32), nlon)
    j1 = jnp.mod(j0 + 1, nlon)
    q00 = q[i0, j0]
    q01 = q[i0, j1]
    q10 = q[i1, j0]
    q11 = q[i1, j1]
    fi = jnp.clip(fi, 0.0, 1.0)
    return ((1 - fi) * ((1 - fj) * q00 + fj * q01)
            + fi * ((1 - fj) * q10 + fj * q11))


def conservation_fixer(q_new: jnp.ndarray, q_old: jnp.ndarray,
                       weights: jnp.ndarray | None = None,
                       eps: float = 1e-30) -> jnp.ndarray:
    """Multiplicative global fixer: rescale the (non-negative) field so its
    weighted integral matches the pre-step integral — the differentiable
    'kernel epilogue' form of E3SM's mass fixers (BASELINE.json)."""
    w = jnp.ones_like(q_new) if weights is None else weights
    q_new = jnp.maximum(q_new, 0.0)
    tot_old = jnp.sum(q_old * w)
    tot_new = jnp.sum(q_new * w)
    return q_new * (tot_old / jnp.maximum(tot_new, eps))


def fv_advect_2d_halo(q_ext: jnp.ndarray, u_ext: jnp.ndarray,
                      v_ext: jnp.ndarray, dt_dx: float, dt_dy: float,
                      is_south, is_north, halo: int = 2) -> jnp.ndarray:
    """Halo-aware FV step for latitude-sharded domains.

    Inputs are extended by ``halo`` ghost rows on both ends (from
    parallel.halo.exchange_halo); returns the interior [nlat_local, nlon].
    is_south/is_north: (traced) booleans marking shards that own a pole
    edge, where the meridional flux is zeroed.
    """
    # zonal sweep on every row incl. ghosts (cheap, keeps halos consistent)
    def zonal(qrow, urow):
        F = _flux_1d(qrow, urow, dt_dx)
        return qrow - dt_dx * (jnp.roll(F, -1) - F)

    q_ext = jax.vmap(zonal)(q_ext, u_ext)

    n = q_ext.shape[0] - 2 * halo

    # meridional fluxes at faces j = 0..n (face j sits between interior
    # rows j-1 and j); donor-cell values need slopes in rows j-1 and j,
    # which need rows j-2..j+1 -> halo width 2. All faces at once via
    # shifted slices (a per-face Python loop would unroll the trace n+1x).
    qmm = q_ext[halo - 2:halo + n - 1]     # rows jq-2 for jq=halo..halo+n
    qm = q_ext[halo - 1:halo + n]
    q0 = q_ext[halo:halo + n + 1]
    qp = q_ext[halo + 1:halo + n + 2]
    v = v_ext[halo:halo + n + 1]           # face velocity from lower cell
    slope_m = _mc_limited_slope(qmm, qm, q0)
    slope_0 = _mc_limited_slope(qm, q0, qp)
    c = v * dt_dy
    q_face_pos = qm + 0.5 * (1.0 - c) * slope_m
    q_face_neg = q0 - 0.5 * (1.0 + c) * slope_0
    faces = jnp.where(v >= 0.0, v * q_face_pos, v * q_face_neg)
    # zero pole-crossing fluxes on edge shards
    faces = faces.at[0].multiply(
        jnp.where(is_south, 0.0, 1.0))
    faces = faces.at[-1].multiply(
        jnp.where(is_north, 0.0, 1.0))
    interior = q_ext[halo:halo + n]
    return interior - dt_dy * (faces[1:] - faces[:-1])


def vertical_advect_column(q: jnp.ndarray, w: jnp.ndarray,
                           dp: jnp.ndarray, dt: float) -> jnp.ndarray:
    """Conservative vertical transport in pressure coordinates per column:
    first-order upwind flux-form with zero flux at TOA and surface.

    q [B, L] tracer, w [B, L+1] pressure velocity (omega, Pa/s) at
    interfaces (positive = downward/increasing p), dp [B, L] layer
    thickness. The first-order donor scheme is monotone and, with the zero
    boundary fluxes, exactly mass-conserving per column.
    """
    w_in = w[:, 1:-1]                     # interior interfaces [B, L-1]
    q_up = q[:, :-1]                      # cell above the interface
    q_dn = q[:, 1:]
    flux = jnp.where(w_in >= 0.0, w_in * q_up, w_in * q_dn)  # [B, L-1]
    zero = jnp.zeros_like(flux[:, :1])
    flux_full = jnp.concatenate([zero, flux, zero], axis=1)  # [B, L+1]
    return q - dt * (flux_full[:, 1:] - flux_full[:, :-1]) / dp


def diagnose_omega(u, v, dt_dx, dt_dy, dp, gather_idx, scatter_idx,
                   nlat: int, nlon: int):
    """Diagnostic pressure velocity from horizontal divergence (continuity
    in pressure coordinates): omega(l+1/2) = -sum_{k<=l} div_k * dp_k.

    u/v [ncol, L] winds in CFL units per step; returns omega at interfaces
    [ncol, L+1] in (Pa per step) units compatible with
    :func:`vertical_advect_column` at dt=1."""
    ug = to_grid(u, gather_idx, nlat, nlon)
    vg = to_grid(v, gather_idx, nlat, nlon)
    # centered divergence on the proxy grid (periodic lon, clamped lat)
    dudx = (jnp.roll(ug, -1, axis=1) - jnp.roll(ug, 1, axis=1)) * 0.5 * dt_dx
    # clamped (one-sided at poles) centered meridional difference
    dvdy = (jnp.concatenate([vg[1:], vg[-1:]], axis=0)
            - jnp.concatenate([vg[:1], vg[:-1]], axis=0)) * 0.5 * dt_dy
    div = to_columns(dudx + dvdy, scatter_idx)            # [ncol, L]
    col_int = jnp.cumsum(div * dp, axis=1)                # [ncol, L]
    zero = jnp.zeros_like(col_int[:, :1])
    return -jnp.concatenate([zero, col_int], axis=1)      # [ncol, L+1]
