"""Balanced-climate synthetic physics (data/synthetic.equilibrium_*):
magnitudes, water-budget closure, and coupled stability — the truth model
for the long-horizon hybrid stability runs (the role E3SM-MMF plays in
the reference's online evaluation, online_testing/README.md §5-6)."""
import jax
import jax.numpy as jnp
import numpy as np

from climsim_tpu.grid import Grid
from climsim_tpu import constants as C
from climsim_tpu.data.synthetic import (EquilibriumConfig,
                                        equilibrium_forcing,
                                        equilibrium_physics,
                                        equilibrium_emulator)
from climsim_tpu.online import HybridLoop, HostLoopConfig

GRID_PATH = "/root/reference/grid_info/ClimSim_low-res_grid-info.nc"


def _state(g, ncol=384, nlev=60, seed=1):
    rng = np.random.default_rng(seed)
    lat = np.asarray(g.lat)[:ncol]
    coslat = np.cos(np.deg2rad(lat))
    s = np.linspace(0, 1, nlev)
    T = (205.0 + (235 + 62 * coslat[:, None] - 205.0) * s[None, :] ** 1.1
         + rng.normal(0, 2, (ncol, nlev))).astype(np.float32)
    x_sfc = equilibrium_forcing(jax.random.PRNGKey(0), g, ncol)
    from climsim_tpu.physics import thermo
    pmid = g.mid_pressure(x_sfc[:, 0])
    qv = 0.6 * thermo.qsat(jnp.asarray(T), pmid)
    return {
        "T": jnp.asarray(T), "qv": jnp.asarray(qv, jnp.float32),
        "qc": jnp.full((ncol, nlev), 1e-6, jnp.float32),
        "qi": jnp.full((ncol, nlev), 1e-6, jnp.float32),
        "u": jnp.asarray(rng.normal(0, 5, (ncol, nlev)), jnp.float32),
        "v": jnp.asarray(rng.normal(0, 2, (ncol, nlev)), jnp.float32),
    }, x_sfc


def test_tendency_magnitudes_match_climsim():
    """ptend magnitudes in the ClimSim dataset's ranges (SURVEY.md §1):
    |dT/dt| ~ 1e-6..1e-3 K/s, |dq/dt| ~ 1e-10..1e-6 s^-1, precip
    O(mm/day)."""
    g = Grid.from_file(GRID_PATH)
    st, x_sfc = _state(g)
    pt, sfc = equilibrium_physics(st["T"], st["qv"], st["qc"], st["qi"],
                                  st["u"], st["v"], x_sfc, g)
    assert pt.shape == (384, 60, 6) and sfc.shape == (384, 8)
    assert np.isfinite(np.asarray(pt)).all()
    assert float(jnp.abs(pt[..., 0]).max()) < 5e-3
    assert float(jnp.abs(pt[..., 0]).mean()) > 1e-7
    assert float(jnp.abs(pt[..., 1]).max()) < 1e-5
    # precip non-negative, snow fraction within [0, 1]
    assert float(sfc[:, 3].min()) >= 0.0
    assert np.all(np.asarray(sfc[:, 2]) <= np.asarray(sfc[:, 3]) + 1e-15)


def test_water_budget_closes():
    """Column integral of (dqv+dqc+dqi)*dp/g + precip mass flux + the
    surface evaporation source = 0 identically (the construction)."""
    g = Grid.from_file(GRID_PATH)
    st, x_sfc = _state(g)
    cfg = EquilibriumConfig()
    pt, sfc = equilibrium_physics(st["T"], st["qv"], st["qc"], st["qi"],
                                  st["u"], st["v"], x_sfc, g, cfg)
    dp_g = g.mass_weights(x_sfc[:, 0])
    col = jnp.sum(dp_g * (pt[..., 1] + pt[..., 2] + pt[..., 3]), axis=1)
    precip_mass = sfc[:, 3] * C.RHO_H2O
    # evaporation source actually delivered (dryness-throttled)
    from climsim_tpu.physics import thermo
    pmid = g.mid_pressure(x_sfc[:, 0])
    qs = thermo.qsat(st["T"], pmid)
    nb = cfg.n_sfc_levels
    dry = jnp.clip(1.0 - st["qv"] / jnp.maximum(qs, 1e-8), 0, 1)[:, -nb:]
    mask_dp = dp_g[:, -nb:]
    mcol = jnp.sum(mask_dp, axis=1, keepdims=True)
    E_delivered = jnp.sum(mask_dp * dry * (x_sfc[:, 3:4] / C.LV) / mcol,
                          axis=1)
    resid = col + precip_mass - E_delivered
    scale = float(jnp.abs(E_delivered).max())
    assert float(jnp.abs(resid).max()) < 1e-6 * max(scale, 1e-30) + 1e-12


def test_coupled_run_is_stable():
    """120 coupled steps through the hybrid loop on the real grid: finite,
    bounded (T in [150, 360] K), non-negative water, and the global-mean
    temperature moves toward equilibrium rather than running away."""
    g = Grid.from_file(GRID_PATH)
    st, x_sfc = _state(g)
    loop = HybridLoop(equilibrium_emulator(g), g,
                      HostLoopConfig(scheme="fv", fix_water=True,
                                     geometry="sphere"))
    mem = jnp.zeros((384, 1, 1), jnp.float32)

    @jax.jit
    def run(st, mem):
        def step(carry, _):
            st, m = carry
            st, m, dg = loop.coupled_step(st, m, x_sfc)
            return (st, m), (jnp.mean(st["T"]), jnp.mean(dg["precc"]))
        (st, mem), (Ts, pr) = jax.lax.scan(step, (st, mem), None,
                                           length=120)
        return st, Ts, pr

    st1, Ts, pr = run(st, mem)
    Ts = np.asarray(Ts)
    assert np.isfinite(Ts).all()
    for k in ("T", "qv", "qc", "qi", "u", "v"):
        assert np.isfinite(np.asarray(st1[k])).all(), k
    assert 150.0 < float(st1["T"].min()) and float(st1["T"].max()) < 360.0
    assert float(st1["qv"].min()) >= 0.0
    # drift decelerates: second-half mean step change < first-half
    d = np.abs(np.diff(Ts))
    assert d[60:].mean() <= d[:60].mean() * 1.5
    assert np.asarray(pr).min() >= 0.0
