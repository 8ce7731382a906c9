"""Spherical-metric advection tests: analytic solid-body rotation
(Williamson et al. 1992 test case 1), Gaussian-hill transport, physical
mass conservation, pole closure, sharded bit-exactness, and the fused
pallas sphere stencil (interpret mode).

These catch exactly the failure the flat raster cannot: without the
cos(phi) metric terms a solid-body flow advances rows at the wrong phase
speed and the area integral drifts."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from climsim_tpu.constants import EARTH_RADIUS, DT_STEP
from climsim_tpu.online import advection as adv

A = EARTH_RADIUS


def _regular_metric(nlat, nlon, dt):
    """Metric for a regular lat grid with centers inset half a band."""
    lats = -90 + (np.arange(nlat) + 0.5) * (180.0 / nlat)
    return adv.spherical_metric(lats, nlon, dt), lats


def _gauss_hill(lats_deg, nlon, lat0, lon0, sigma_deg):
    """Gaussian of GREAT-CIRCLE distance from (lat0, lon0) [deg]."""
    lons_deg = np.arange(nlon) * (360.0 / nlon)
    phi = np.deg2rad(lats_deg)[:, None]
    lam = np.deg2rad(lons_deg)[None, :]
    p0, l0 = np.deg2rad(lat0), np.deg2rad(lon0)
    cosd = (np.sin(phi) * np.sin(p0)
            + np.cos(phi) * np.cos(p0) * np.cos(lam - l0))
    d = np.arccos(np.clip(cosd, -1, 1))
    return np.exp(-(d / np.deg2rad(sigma_deg)) ** 2).astype(np.float32)


def test_metric_area_closes():
    """Sum of relative cell areas -> sphere solid angle 4*pi with
    second-order convergence (cell_w is the midpoint-rule weight the FV
    scheme actually conserves, so it closes 4*pi only in the limit)."""
    err = []
    for nlat in (16, 32, 64):
        m, _ = _regular_metric(nlat, 2 * nlat, DT_STEP)
        total = float(np.sum(m.cell_w.astype(np.float64)) * 2 * nlat)
        err.append(abs(total - 4 * np.pi) / (4 * np.pi))
    assert err[0] < 5e-3
    assert err[2] < err[1] < err[0]
    assert err[0] / err[2] > 10      # ~16x for second order


def test_zonal_solid_body_rotation_full_revolution():
    """Solid-body rotation about the polar axis (u = U cos(phi), v = 0):
    in the METRIC scheme every latitude advances at the same angular
    rate, so a Gaussian hill at 40N returns to its start after one full
    revolution. A flat raster advances all rows at the same LINEAR rate
    and scatters the hill zonally — this is the analytic test that
    catches the missing cos(phi) terms."""
    nlat, nlon = 48, 96
    dt = DT_STEP
    m, lats = _regular_metric(nlat, nlon, dt)
    courant = 0.5                       # index-space cells per step
    omega = courant * (2 * np.pi / nlon) / dt      # rad/s
    u = (omega * A * np.cos(np.deg2rad(lats)))[:, None] \
        * np.ones((1, nlon), np.float32)
    v = np.zeros((nlat, nlon), np.float32)
    q0 = _gauss_hill(lats, nlon, 40.0, 90.0, 12.0)

    n_steps = int(round(nlon / courant))           # one revolution
    step = jax.jit(lambda q: adv.fv_advect_2d_sphere(
        q, jnp.asarray(u), jnp.asarray(v), m))

    q = jnp.asarray(q0)
    for _ in range(n_steps):
        q = step(q)
    q = np.asarray(q)

    err = np.linalg.norm(q - q0) / np.linalg.norm(q0)
    assert err < 0.35, f"rotation L2 error {err:.3f}"
    # monotone: the limiter must not overshoot
    assert q.max() <= q0.max() + 1e-5
    assert q.min() >= -1e-6
    # physical mass conserved through all steps
    mass0 = float(np.sum(q0.astype(np.float64) * m.cell_w[:, None]))
    mass1 = float(np.sum(q.astype(np.float64) * m.cell_w[:, None]))
    np.testing.assert_allclose(mass1, mass0, rtol=3e-5)


def test_tilted_solid_body_rotation_analytic():
    """Williamson case 1 with the rotation axis tilted 45 deg: the hill
    crosses latitude circles so the meridional cos(phi) face weights are
    exercised; compare against the exact rotated solution after a
    quarter revolution."""
    nlat, nlon = 48, 96
    dt = DT_STEP
    m, lats = _regular_metric(nlat, nlon, dt)
    lons = np.arange(nlon) * (360.0 / nlon)
    alpha = np.deg2rad(45.0)
    courant = 0.4
    omega = courant * (2 * np.pi / nlon) / dt
    u0 = omega * A
    phi = np.deg2rad(lats)[:, None]
    lam = np.deg2rad(lons)[None, :]
    u = (u0 * (np.cos(phi) * np.cos(alpha)
               + np.sin(phi) * np.cos(lam) * np.sin(alpha))).astype(
                   np.float32) * np.ones((1, nlon), np.float32)
    v = (-u0 * np.sin(lam) * np.sin(alpha)).astype(np.float32) \
        * np.ones((nlat, 1), np.float32)

    lat0, lon0 = 0.0, 270.0            # moves toward high latitude first
    q0 = _gauss_hill(lats, nlon, lat0, lon0, 14.0)
    n_steps = int(round(nlon / courant)) // 4      # quarter revolution

    step = jax.jit(lambda q: adv.fv_advect_2d_sphere(
        q, jnp.asarray(u), jnp.asarray(v), m))
    q = jnp.asarray(q0)
    for _ in range(n_steps):
        q = step(q)
    q = np.asarray(q)

    # exact solution: rotate the hill center by theta about the tilted
    # axis n = (-sin(alpha), 0, cos(alpha))
    theta = omega * n_steps * dt
    n_ax = np.array([-np.sin(alpha), 0.0, np.cos(alpha)])
    p0 = np.array([np.cos(np.deg2rad(lat0)) * np.cos(np.deg2rad(lon0)),
                   np.cos(np.deg2rad(lat0)) * np.sin(np.deg2rad(lon0)),
                   np.sin(np.deg2rad(lat0))])
    # Rodrigues rotation
    p1 = (p0 * np.cos(theta) + np.cross(n_ax, p0) * np.sin(theta)
          + n_ax * np.dot(n_ax, p0) * (1 - np.cos(theta)))
    lat1 = np.rad2deg(np.arcsin(np.clip(p1[2], -1, 1)))
    lon1 = np.rad2deg(np.arctan2(p1[1], p1[0])) % 360.0
    q_exact = _gauss_hill(lats, nlon, lat1, lon1, 14.0)

    err = np.linalg.norm(q - q_exact) / np.linalg.norm(q_exact)
    assert err < 0.30, f"tilted rotation L2 error {err:.3f}"
    # the analytic wind is divergence-free but its DISCRETE constant-field
    # flux divergence is only second-order zero, so the advective form
    # conserves to truncation error rather than roundoff here
    mass0 = float(np.sum(q0.astype(np.float64) * m.cell_w[:, None]))
    mass1 = float(np.sum(q.astype(np.float64) * m.cell_w[:, None]))
    np.testing.assert_allclose(mass1, mass0, rtol=1e-2)


def test_sphere_mass_conservation_random_winds():
    """Random compressible winds, 20 steps: the advective-form scheme
    keeps the physical integral approximately conserved (the error is
    the q'-div covariance), stays bounded within the initial range, and
    preserves constants EXACTLY — the raw flux form instead grew the
    field at the local-divergence rate (e-folding ~1e5 s), which is the
    blow-up the long coupled runs hit."""
    nlat, nlon = 24, 48
    m, lats = _regular_metric(nlat, nlon, DT_STEP)
    rng = np.random.default_rng(7)
    u = rng.normal(0, 20, (nlat, nlon)).astype(np.float32)
    v = rng.normal(0, 10, (nlat, nlon)).astype(np.float32)
    q0 = np.abs(rng.normal(1, 0.3, (nlat, nlon))).astype(np.float32)
    step = jax.jit(lambda q: adv.fv_advect_2d_sphere(
        q, jnp.asarray(u), jnp.asarray(v), m))
    q = jnp.asarray(q0)
    for _ in range(20):
        q = step(q)
    mass0 = float(np.sum(q0.astype(np.float64) * m.cell_w[:, None]))
    mass1 = float(np.sum(np.asarray(q, np.float64) * m.cell_w[:, None]))
    np.testing.assert_allclose(mass1, mass0, rtol=0.03)
    assert np.isfinite(np.asarray(q)).all()
    assert float(q.max()) <= float(q0.max()) * 1.001
    assert float(q.min()) >= -1e-6
    # free-stream preservation: constants are a fixed point
    qc = jnp.full((nlat, nlon), 2.5)
    for _ in range(20):
        qc = step(qc)
    np.testing.assert_allclose(np.asarray(qc), 2.5, rtol=1e-6)
    # and with the area-weighted fixer (the host loop's epilogue) the
    # integral is restored exactly
    fixed = adv.conservation_fixer(q, jnp.asarray(q0),
                                   jnp.asarray(m.cell_w)[:, None])
    np.testing.assert_allclose(
        float(np.sum(np.asarray(fixed, np.float64) * m.cell_w[:, None])),
        mass0, rtol=1e-6)


def test_polar_courant_clamp_keeps_stability():
    """Strong zonal jet across the thinnest polar rows: unclamped courant
    would exceed 20; the clamp must keep the field bounded and conserved."""
    nlat, nlon = 36, 72
    m, lats = _regular_metric(nlat, nlon, DT_STEP)
    u = np.full((nlat, nlon), 120.0, np.float32)   # extreme jet
    v = np.zeros((nlat, nlon), np.float32)
    rng = np.random.default_rng(3)
    q0 = np.abs(rng.normal(1, 0.2, (nlat, nlon))).astype(np.float32)
    step = jax.jit(lambda q: adv.fv_advect_2d_sphere(
        q, jnp.asarray(u), jnp.asarray(v), m))
    q = jnp.asarray(q0)
    for _ in range(50):
        q = step(q)
    q = np.asarray(q)
    assert np.isfinite(q).all()
    assert q.max() < q0.max() * 1.01 and q.min() > -1e-5
    mass0 = float(np.sum(q0.astype(np.float64) * m.cell_w[:, None]))
    mass1 = float(np.sum(q.astype(np.float64) * m.cell_w[:, None]))
    np.testing.assert_allclose(mass1, mass0, rtol=3e-5)


def test_sphere_halo_path_matches_single_device():
    """fv_advect_2d_sphere_halo over 4 latitude shards with manually-built
    ghost rows reproduces the single-device step bit-exactly."""
    nlat, nlon, nsh = 32, 48, 4
    m, lats = _regular_metric(nlat, nlon, DT_STEP)
    rng = np.random.default_rng(11)
    q = rng.normal(1, 0.2, (nlat, nlon)).astype(np.float32)
    u = rng.normal(0, 15, (nlat, nlon)).astype(np.float32)
    v = rng.normal(0, 8, (nlat, nlon)).astype(np.float32)
    ref = np.asarray(adv.fv_advect_2d_sphere(
        jnp.asarray(q), jnp.asarray(u), jnp.asarray(v), m))

    loc = nlat // nsh
    ext_global = lambda a: np.concatenate(
        [a[:1], a[:1], a, a[-1:], a[-1:]], axis=0)
    qe, ue, ve = ext_global(q), ext_global(u), ext_global(v)
    parts = []
    for s in range(nsh):
        row0 = s * loc
        sl = slice(row0, row0 + loc + 4)      # halo 2 each side
        out = adv.fv_advect_2d_sphere_halo(
            jnp.asarray(qe[sl]), jnp.asarray(ue[sl]), jnp.asarray(ve[sl]),
            m, row0)
        parts.append(np.asarray(out))
    got = np.concatenate(parts, axis=0)
    np.testing.assert_array_equal(got, ref)


def test_pallas_sphere_stencil_interpret_matches_reference():
    """Fused multi-tracer sphere kernel (interpret mode off-TPU inside
    the custom_vjp primal is the jnp reference; here we force the pallas
    program in interpret mode and compare)."""
    from climsim_tpu.ops.pallas_stencil import (_fv_sphere_fwd_impl,
                                                _fv_sphere_reference)
    nlat, nlon, nlev, ntrac = 16, 24, 4, 3
    m, lats = _regular_metric(nlat, nlon, DT_STEP)
    rng = np.random.default_rng(5)
    qs = jnp.asarray(rng.normal(1, 0.3, (ntrac, nlev, nlat, nlon)),
                     jnp.float32)
    u = jnp.asarray(rng.normal(0, 15, (nlev, nlat, nlon)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 8, (nlev, nlat, nlon)), jnp.float32)
    got = np.asarray(_fv_sphere_fwd_impl(qs, u, v, m, interpret=True))
    ref = np.asarray(_fv_sphere_reference(qs, u, v, m))
    np.testing.assert_allclose(got, ref, rtol=2e-6, atol=2e-6)


def test_diagnose_omega_sphere_nondivergent_flow():
    """Solid-body zonal flow is non-divergent on the sphere: the
    metric-aware omega diagnosis must return ~0 everywhere (the flat
    diagnosis on the same winds does too — the discriminating part is
    the d(v cos phi)/dphi term, checked with a meridional flow)."""
    nlat, nlon = 16, 24
    m, lats = _regular_metric(nlat, nlon, DT_STEP)
    gather, scatter = np.arange(nlat * nlon), np.arange(nlat * nlon)
    L = 5
    u_col = np.repeat(
        (20.0 * np.cos(np.deg2rad(lats)))[:, None], nlon, 1).reshape(-1)
    u = jnp.asarray(np.repeat(u_col[:, None], L, 1), jnp.float32)
    v = jnp.zeros_like(u)
    dp = jnp.full((nlat * nlon, L), 50.0)
    om = adv.diagnose_omega(u, v, 1.0, 1.0, dp, jnp.asarray(gather),
                            jnp.asarray(scatter), nlat, nlon, metric=m)
    np.testing.assert_allclose(np.asarray(om), 0.0, atol=1e-10)

    # uniform v: flat divergence ~0 except poles, but on the sphere
    # d(v cos phi)/dphi != 0 -> metric omega must be NONZERO mid-grid
    v2 = jnp.full_like(u, 5.0)
    om2 = adv.diagnose_omega(jnp.zeros_like(u), v2, 1.0, 1.0, dp,
                             jnp.asarray(gather), jnp.asarray(scatter),
                             nlat, nlon, metric=m)
    assert float(jnp.max(jnp.abs(om2))) > 1e-6


def test_hybrid_loop_sphere_defaults_and_conserves_physically():
    """HybridLoop default geometry is 'sphere': metric built from the real
    grid file latitudes; with the fixer on, the PHYSICAL (dp/g x area)
    water integral is conserved."""
    from climsim_tpu.grid import Grid
    from climsim_tpu.online import HybridLoop, HostLoopConfig
    g = Grid.from_file(
        "/root/reference/grid_info/ClimSim_low-res_grid-info.nc")

    def emulator(x_main, x_sfc, mem):
        B, L, _ = x_main.shape
        return jnp.zeros((B, L, 6)), jnp.zeros((B, 8)), mem

    loop = HybridLoop(emulator, g, HostLoopConfig(scheme="fv",
                                                  fix_water=True))
    assert loop.metric is not None
    rng = np.random.default_rng(4)
    state = {
        "T": jnp.asarray(rng.uniform(220, 300, (384, 60))),
        "qv": jnp.asarray(np.abs(rng.normal(1e-3, 3e-4, (384, 60)))),
        "qc": jnp.asarray(np.abs(rng.normal(1e-5, 3e-6, (384, 60)))),
        "qi": jnp.asarray(np.abs(rng.normal(1e-5, 3e-6, (384, 60)))),
        "u": jnp.asarray(rng.normal(0, 10, (384, 60))),
        "v": jnp.asarray(rng.normal(0, 3, (384, 60))),
    }
    mem = jnp.zeros((384, 60, 8))
    x_sfc = jnp.concatenate([jnp.full((384, 1), 1e5),
                             jnp.ones((384, 23))], axis=1)
    w = g.mass_weights(x_sfc[:, 0]) * g.area_wgt[:, None]
    total0 = float(jnp.sum(state["qv"] * w))
    state2, _, _ = jax.jit(
        lambda s, mm: loop.rollout(s, mm, x_sfc, 3))(state, mem)
    total1 = float(jnp.sum(state2["qv"] * w))
    np.testing.assert_allclose(total1, total0, rtol=1e-6)
    for k, vv in state2.items():
        assert np.isfinite(np.asarray(vv)).all(), k
