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

* :func:`fv_advect_2d` — finite-volume transport with van Leer
  (MC-limited) reconstruction, dimensionally split, periodic in longitude
  and clamped at the poles. The update is the ADVECTIVE (free-stream-
  preserving) form assembled from conservative fluxes: the divergence of
  the constant-field flux is subtracted, q_new = q - [div(F_q) -
  q*div(F_1)]. On prescribed compressible winds with fixed density the
  raw flux form accumulates tracer exponentially at flow-convergence
  points (growth rate = local div(u), e-folding ~1e5 s for |div|~1e-5 —
  measured blow-up in multi-week coupled runs); the correction transports
  mixing-ratio-like fields (T, q, u, v) boundedly instead, is EXACTLY
  conservative whenever the discrete winds are divergence-free, and the
  host loop's :func:`conservation_fixer` restores global water mass
  otherwise (the same division of labor as E3SM's advect-then-fix);
* :func:`semi_lagrangian_2d` — back-trajectory + bilinear interpolation
  (non-conservative, unconditionally stable for long steps).

Both are pure jnp on [nlat(+halo), nlon] arrays so they vectorize over
(level, tracer) via vmap, run under jit, and shard over a mesh 'col' axis
with :mod:`climsim_tpu.parallel.halo` providing the latitude ghost rows
(2 rows for the limiter stencil).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import EARTH_RADIUS


@dataclass(frozen=True)
class SphericalMetric:
    """Per-row metric factors for flux-form FV transport on the sphere.

    The real-geography analog of the reference's per-cell areas
    (climsim_utils/data_utils.py:74): cells of a latitude-band proxy grid
    get dx = a*cos(phi)*dlon and per-band dphi from the actual column
    latitudes, so zonal transport speeds up toward the poles and the
    conserved integral is the PHYSICAL area integral sum(q*cosc*dphi*dlon)
    (x a^2), not the raster sum.

    Arrays (numpy float32, static per loop):
      dtdx   [nlat]    dt / (a cos(phi_i) dlon)      (zonal courant / m/s)
      dtdy   [nlat]    dt / (a dphi_i)               (merid. courant / m/s)
      cf_fac [nlat+1]  dt / (a dphi_face)            (merid. courant / m/s)
      wf     [nlat+1]  cos(phi_face) * dphi_face     (face flux weight)
      wc     [nlat]    1 / (cos(phi_i) * dphi_i)     (cell update weight)
      cosc   [nlat]    cos(phi_i)                    (center cosine)
      cell_w [nlat]    cos(phi_i) * dphi_i * dlon    (relative cell area)

    Pole faces have cos(+-90 deg) = 0, so pole-crossing fluxes vanish
    identically and conservation survives cos(phi) -> 0. Zonal courant
    numbers are clamped to +-cfl_max inside the sweeps: near the poles
    dx -> 0 makes fixed-dlon cells arbitrarily thin, and clamping the
    courant (rather than the velocity) keeps the scheme stable AND
    conservative (fluxes still telescope) at the cost of slowed transport
    in rows where |u| dt > cfl_max * dx.
    """
    dtdx: np.ndarray
    dtdy: np.ndarray
    cf_fac: np.ndarray
    wf: np.ndarray
    wc: np.ndarray
    cosc: np.ndarray
    cell_w: np.ndarray
    cfl_max: float = 0.9

    @property
    def nlat(self) -> int:
        return self.dtdx.shape[0]


def spherical_metric(band_lats_deg: np.ndarray, nlon: int, dt: float,
                     radius: float = EARTH_RADIUS,
                     cfl_max: float = 0.9) -> SphericalMetric:
    """Build the metric from the proxy grid's band-mean latitudes
    (ascending, degrees). Face latitudes are midpoints between band
    centers with the poles closing the ends."""
    lat = np.asarray(band_lats_deg, np.float64)
    assert np.all(np.diff(lat) > 0), "band latitudes must be ascending"
    phi = np.deg2rad(lat)
    phi_f = np.concatenate([[-np.pi / 2],
                            0.5 * (phi[:-1] + phi[1:]),
                            [np.pi / 2]])
    dphi = np.diff(phi_f)                               # [nlat]
    # face-local dphi for courant numbers: distance between the adjacent
    # cell centers (edge faces reuse the edge cell's dphi — their flux is
    # zeroed by cos(+-90) anyway)
    dphi_f = np.concatenate([[dphi[0]], np.diff(phi), [dphi[-1]]])
    dlon = 2.0 * np.pi / nlon
    cosc = np.cos(phi)
    cosf = np.cos(phi_f)
    cosf[0] = cosf[-1] = 0.0                            # exact pole closure
    f32 = lambda a: np.asarray(a, np.float32)
    return SphericalMetric(
        dtdx=f32(dt / (radius * cosc * dlon)),
        dtdy=f32(dt / (radius * dphi)),
        cf_fac=f32(dt / (radius * dphi_f)),
        wf=f32(cosf * dphi_f),
        wc=f32(1.0 / (cosc * dphi)),
        cosc=f32(cosc),
        cell_w=f32(cosc * dphi * dlon),
        cfl_max=cfl_max)


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


def semi_lagrangian_2d_halo(q_ext: jnp.ndarray, u_ext: jnp.ndarray,
                            v_ext: jnp.ndarray, dt_dx_rows: jnp.ndarray,
                            dt_dy_rows: jnp.ndarray, row0, nlat_total: int,
                            halo: int = 2) -> jnp.ndarray:
    """Halo-aware semi-Lagrangian transport for latitude-sharded domains.

    Inputs extended by ``halo`` ghost rows (parallel.halo.exchange_halo);
    returns the interior [nlat_local, nlon]. ``dt_dx_rows``/``dt_dy_rows``
    are per-EXTENDED-row factors [n_ext, 1] (constant for the flat raster,
    metric.dtdx/dtdy slices for the sphere); ``row0`` is the global index
    of the first interior row; ``nlat_total`` the global row count.

    Bit-identical to :func:`semi_lagrangian_2d` on the assembled global
    grid whenever the meridional displacement stays within the halo
    (|v|*dt_dy <= halo - 1, one extra row for the interpolation stencil);
    larger displacements clamp to the shard's ghost rows (stable, but the
    trajectory is truncated — mirror of the FV courant clamp). The
    truncation is SILENT here (jit-compatible); use
    :func:`semi_lagrangian_halo_clip_fraction` on the wind field to
    monitor/assert the bound (tests/test_online.py does for the certified
    sharded configs).
    """
    n_ext, nlon = q_ext.shape
    n = n_ext - 2 * halo
    u = u_ext[halo:halo + n]
    v = v_ext[halo:halo + n]
    # global fractional indices of the local interior rows
    ig = jax.lax.broadcasted_iota(jnp.float32, (n, nlon), 0) + row0
    j = jax.lax.broadcasted_iota(jnp.float32, (n, nlon), 1)
    dep_i = ig - v * dt_dy_rows[halo:halo + n]
    dep_j = j - u * dt_dx_rows[halo:halo + n]
    i0g = jnp.clip(jnp.floor(dep_i), 0, nlat_total - 1)
    fi = jnp.clip(dep_i - i0g, 0.0, 1.0)
    i1g = jnp.clip(i0g + 1, 0, nlat_total - 1)
    # map global rows into the extended local window (clamped: trajectories
    # beyond the halo reuse the outermost ghost row)
    loc = lambda a: jnp.clip(a.astype(jnp.int32) - row0 + halo, 0, n_ext - 1)
    i0, i1 = loc(i0g), loc(i1g)
    j0f = jnp.floor(dep_j)
    fj = dep_j - j0f
    j0 = jnp.mod(j0f.astype(jnp.int32), nlon)
    j1 = jnp.mod(j0 + 1, nlon)
    q00 = q_ext[i0, j0]
    q01 = q_ext[i0, j1]
    q10 = q_ext[i1, j0]
    q11 = q_ext[i1, j1]
    return ((1 - fi) * ((1 - fj) * q00 + fj * q01)
            + fi * ((1 - fj) * q10 + fj * q11))


def semi_lagrangian_halo_clip_fraction(v, dt_dy, halo: int = 2):
    """Fraction of points whose meridional back-trajectory exceeds the
    halo-parity window (|v|*dt_dy > halo - 1) — the displacement regime
    where :func:`semi_lagrangian_2d_halo` clamps to the outermost ghost
    row and sharded results silently diverge from the single-device
    kernel. Monitor it in long-run diagnostics or assert == 0 for a
    config certified as sharded-parity; a finer dt or stronger winds
    trip it before parity is lost without notice otherwise.

    ``dt_dy`` may be a scalar (flat raster) or broadcastable per-row
    factors (sphere metric rows aligned with ``v``'s rows).
    """
    disp = jnp.abs(v * dt_dy)
    return jnp.mean((disp > (halo - 1)).astype(jnp.float32))


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
    # zonal sweep on every row incl. ghosts (cheap, keeps halos consistent);
    # advective form: subtract q times the constant-field flux divergence
    def zonal(qrow, urow):
        F = _flux_1d(qrow, urow, dt_dx)
        return qrow - dt_dx * ((jnp.roll(F, -1) - F)
                               - qrow * (jnp.roll(urow, -1) - urow))

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
    # zero pole-crossing fluxes on edge shards (the constant-field flux —
    # the face velocity itself — carries the same closure)
    smask = jnp.where(is_south, 0.0, 1.0)
    nmask = jnp.where(is_north, 0.0, 1.0)
    faces = faces.at[0].multiply(smask)
    faces = faces.at[-1].multiply(nmask)
    vmasked = v.at[0].multiply(smask).at[-1].multiply(nmask)
    interior = q_ext[halo:halo + n]
    return interior - dt_dy * ((faces[1:] - faces[:-1])
                               - interior * (vmasked[1:] - vmasked[:-1]))


def _courant_flux_1d(q, c):
    """Periodic van-Leer interface fluxes in COURANT units: c[i] is the
    (already clamped) courant number at the left face of cell i; returns
    Fc[i] = c * q_face, so the update is q - (roll(Fc,-1) - Fc)."""
    qm = jnp.roll(q, 1)
    qmm = jnp.roll(q, 2)
    qp = jnp.roll(q, -1)
    slope_m = _mc_limited_slope(qmm, qm, q)
    slope_0 = _mc_limited_slope(qm, q, qp)
    q_face_pos = qm + 0.5 * (1.0 - c) * slope_m
    q_face_neg = q - 0.5 * (1.0 + c) * slope_0
    return jnp.where(c >= 0.0, c * q_face_pos, c * q_face_neg)


def fv_advect_2d_sphere_halo(q_ext: jnp.ndarray, u_ext: jnp.ndarray,
                             v_ext: jnp.ndarray, m: SphericalMetric,
                             row0, halo: int = 2) -> jnp.ndarray:
    """Halo-aware spherical flux-form FV step (see :class:`SphericalMetric`
    for the discretization and its conservation property).

    q/u/v_ext: [nlat_local + 2*halo, nlon], winds in m/s. ``row0`` is the
    global index of the first interior row (0 for single device; traced
    under shard_map). Pole faces carry cos(phi)=0 so no is_south/is_north
    flags are needed — the pole closure is part of the metric.
    """
    n = q_ext.shape[0] - 2 * halo
    cfl = m.cfl_max
    # per-row metric slices: padded-by-halo global arrays indexed so that
    # extended local row r corresponds to global row row0 - halo + r
    dtdx_pad = jnp.asarray(np.pad(m.dtdx, halo, mode="edge"))
    dtdx_ext = jax.lax.dynamic_slice(dtdx_pad, (row0,), (q_ext.shape[0],))
    cf_fac = jax.lax.dynamic_slice(jnp.asarray(m.cf_fac), (row0,), (n + 1,))
    wf = jax.lax.dynamic_slice(jnp.asarray(m.wf), (row0,), (n + 1,))
    wc = jax.lax.dynamic_slice(jnp.asarray(m.wc), (row0,), (n,))

    # zonal sweep on every row incl. ghosts, per-row courant
    def zonal(qrow, urow, dtdx):
        c = jnp.clip(urow * dtdx, -cfl, cfl)
        Fc = _courant_flux_1d(qrow, c)
        # advective form: the constant-field flux is c itself
        return qrow - ((jnp.roll(Fc, -1) - Fc)
                       - qrow * (jnp.roll(c, -1) - c))

    q_ext = jax.vmap(zonal)(q_ext, u_ext, dtdx_ext)

    # meridional faces j = 0..n between interior rows j-1 and j
    qmm = q_ext[halo - 2:halo + n - 1]
    qm = q_ext[halo - 1:halo + n]
    q0 = q_ext[halo:halo + n + 1]
    qp = q_ext[halo + 1:halo + n + 2]
    vf = v_ext[halo:halo + n + 1]          # face velocity convention as flat
    slope_m = _mc_limited_slope(qmm, qm, q0)
    slope_0 = _mc_limited_slope(qm, q0, qp)
    c = jnp.clip(vf * cf_fac[:, None], -cfl, cfl)
    q_face_pos = qm + 0.5 * (1.0 - c) * slope_m
    q_face_neg = q0 - 0.5 * (1.0 + c) * slope_0
    faces = jnp.where(c >= 0.0, c * q_face_pos, c * q_face_neg)
    flux = wf[:, None] * faces             # cos(phi_f) dphi_f * c * q_face
    fluxc = wf[:, None] * c                # constant-field flux (q_face=1)
    interior = q_ext[halo:halo + n]
    return interior - wc[:, None] * ((flux[1:] - flux[:-1])
                                     - interior * (fluxc[1:] - fluxc[:-1]))


def fv_advect_2d_sphere(q: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray,
                        m: SphericalMetric) -> jnp.ndarray:
    """Single-device spherical FV step on the full [nlat, nlon] grid;
    identical numerics to the halo path with clamped ghost rows, so
    sharded and unsharded execution are bit-identical."""
    ext = lambda a: jnp.concatenate([a[:1], a[:1], a, a[-1:], a[-1:]],
                                    axis=0)
    return fv_advect_2d_sphere_halo(ext(q), ext(u), ext(v), m, 0)


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
    # advective form (see fv_advect_2d): subtract q times the divergence
    # of the constant-field flux so compressible omega transports the
    # mixing ratio instead of accumulating it
    w_full = jnp.concatenate([zero, w_in, zero], axis=1)
    return q - dt * ((flux_full[:, 1:] - flux_full[:, :-1])
                     - q * (w_full[:, 1:] - w_full[:, :-1])) / dp


def diagnose_omega(u, v, dt_dx, dt_dy, dp, gather_idx, scatter_idx,
                   nlat: int, nlon: int,
                   metric: SphericalMetric | None = None):
    """Diagnostic pressure velocity from horizontal divergence (continuity
    in pressure coordinates): omega(l+1/2) = -sum_{k<=l} div_k * dp_k.

    u/v [ncol, L] winds; with ``metric=None`` they are in CFL units per
    step and dt_dx/dt_dy are the constant flat-raster factors; with a
    :class:`SphericalMetric` they are in m/s and the divergence carries
    the spherical terms div = (1/(a cos phi))(du/dlon + d(v cos phi)/dphi).
    Returns omega at interfaces [ncol, L+1] in (Pa per step) units
    compatible with :func:`vertical_advect_column` at dt=1."""
    ug = to_grid(u, gather_idx, nlat, nlon)
    vg = to_grid(v, gather_idx, nlat, nlon)
    clampdiff = lambda a: (jnp.concatenate([a[1:], a[-1:]], axis=0)
                           - jnp.concatenate([a[:1], a[:-1]], axis=0)) * 0.5
    if metric is not None:
        ex = lambda a: jnp.asarray(a)[:, None, None]
        dudx = (jnp.roll(ug, -1, axis=1)
                - jnp.roll(ug, 1, axis=1)) * 0.5 * ex(metric.dtdx)
        # (1/cos phi) d(v cos phi)/dphi, one-sided at the pole rows
        dvdy = clampdiff(vg * ex(metric.cosc)) \
            * ex(metric.dtdy) / ex(metric.cosc)
    else:
        # centered divergence on the flat raster (periodic lon, clamped)
        dudx = (jnp.roll(ug, -1, axis=1)
                - jnp.roll(ug, 1, axis=1)) * 0.5 * dt_dx
        dvdy = clampdiff(vg) * dt_dy
    div = to_columns(dudx + dvdy, scatter_idx)            # [ncol, L]
    col_int = jnp.cumsum(div * dp, axis=1)                # [ncol, L]
    zero = jnp.zeros_like(col_int[:, :1])
    return -jnp.concatenate([zero, col_int], axis=1)      # [ncol, L+1]
