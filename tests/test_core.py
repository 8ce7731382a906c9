"""Core-library tests: IO, grid, variable registries, thermo, transforms,
normalization, conservation. NumPy references are written independently from
the formulas in SURVEY.md §7.4 (behavioral contracts)."""
import numpy as np
import jax.numpy as jnp
import pytest

import climsim_tpu.constants as C
from climsim_tpu import variables as V
from climsim_tpu.grid import Grid
from climsim_tpu.io import read_netcdf
from climsim_tpu.physics import thermo, transforms, conservation
from climsim_tpu.data import Normalizer, LevelNormalizer

GRID_PATH = "/root/reference/grid_info/ClimSim_low-res_grid-info.nc"
NORM_DIR = "/root/reference/preprocessing/normalizations"


# ---------------------------------------------------------------- IO / grid

def test_cdf5_grid_file():
    raw = read_netcdf(GRID_PATH)
    assert raw["lat"].shape == (384,)
    assert raw["hyai"].shape == (61,)
    assert raw["hybi"].shape == (61,)
    assert float(np.asarray(raw["P0"]).ravel()[0]) == 1e5
    # hybrid coefficients: hybi monotonically nondecreasing, ends at 1
    assert np.all(np.diff(raw["hybi"]) >= -1e-12)
    assert abs(raw["hybi"][-1] - 1.0) < 1e-12
    # area positive, lat within bounds
    assert np.all(raw["area"] > 0)
    assert np.all(np.abs(raw["lat"]) <= 90.0)


def test_grid_pressure_ops():
    g = Grid.from_file(GRID_PATH, dtype=jnp.float64)
    ps = jnp.full((4,), 1.0e5)
    pint = g.interface_pressure(ps)
    assert pint.shape == (4, 61)
    # surface interface pressure equals ps when hybi[-1]=1, hyai[-1]=0
    np.testing.assert_allclose(np.asarray(pint[:, -1]), 1.0e5, rtol=1e-6)
    dp = g.layer_thickness(ps)
    assert np.all(np.asarray(dp) > 0)
    # sum of dp = p_sfc - p_top
    np.testing.assert_allclose(np.asarray(dp.sum(-1)),
                               np.asarray(pint[:, -1] - pint[:, 0]), rtol=1e-6)
    mw = g.mass_weights(ps)
    np.testing.assert_allclose(np.asarray(mw), np.asarray(dp) / C.GRAV,
                               rtol=1e-12)


def test_grid_area_weights():
    g = Grid.from_file(GRID_PATH)
    aw = np.asarray(g.area_wgt)
    np.testing.assert_allclose(aw.mean(), 1.0, rtol=1e-6)


# ------------------------------------------------------------- variable sets

@pytest.mark.parametrize("name,nx,ny,psi", [
    ("v1", 124, 128, 120),
    ("v2", 557, 368, 360),
    ("v4", 1525, 368, 1500),
    ("v5", 1405, 308, 1380),
])
def test_feature_lengths(name, nx, ny, psi):
    vs = V.get(name)
    assert vs.input_feature_len == nx
    assert vs.target_feature_len == ny
    assert vs.ps_index == psi


def test_v2_rh_lengths():
    vs = V.get("v2_rh")
    assert vs.input_feature_len == 557
    assert vs.target_feature_len == 368
    # NOTE: reference's set_to_v2_rh_vars hardcodes ps_index=360 (a stale
    # copy of v2); the true flat index of state_ps in the v2_rh ordering is
    # 540 (9 level vars precede the scalars). We use the computed value.
    assert vs.ps_index == 540


def test_v4_contracts():
    vs = V.get("v4")
    # SNOWHICE sits at flat index 1515 (SURVEY.md §7.3 layout quirks)
    assert vs.inputs.index("cam_in_SNOWHICE") == 1515
    assert vs.inputs.n_lev_vars == 25
    assert vs.inputs.n_sfc_vars == 25
    assert vs.outputs.n_lev_vars == 6
    assert vs.outputs.n_sfc_vars == 8


def test_v4_rnn_excludes_prvphy_and_icol():
    vs = V.get("v4_rnn")
    for n in vs.inputs.names:
        assert "prvphy" not in n and n != "icol"
    assert vs.inputs.n_lev_vars == 15
    # v4_rnn keeplev: 15 lev vars + 24 scalars = 15*60+24
    assert vs.input_feature_len == 15 * 60 + 24


def test_output_ordering_v2():
    """The binding 368-feature output layout (online_testing/README.md §3.1)."""
    out = V.get("v2").outputs
    assert out.names[:6] == ("ptend_t", "ptend_q0001", "ptend_q0002",
                             "ptend_q0003", "ptend_u", "ptend_v")
    assert out.index("cam_out_NETSW") == 360
    assert out.index("cam_out_SOLLD") == 367


# ------------------------------------------------------------------- thermo

def _np_eliq(T):
    a_liq = np.array([-0.976195544e-15, -0.952447341e-13, 0.640689451e-10,
                      0.206739458e-7, 0.302950461e-5, 0.264847430e-3,
                      0.142986287e-1, 0.443987641, 6.11239921])
    return 100 * np.polyval(a_liq, np.maximum(-80, T - 273.16))


def _np_eice(T):
    a_ice = np.array([0.252751365e-14, 0.146898966e-11, 0.385852041e-9,
                      0.602588177e-7, 0.615021634e-5, 0.420895665e-3,
                      0.188439774e-1, 0.503160820, 6.11147274])
    c_ice = np.array([273.15, 185, -100, 0.00763685, 0.000151069, 7.48215e-07])
    T0 = 273.16
    return ((T > c_ice[0]) * _np_eliq(T)
            + (T <= c_ice[0]) * (T > c_ice[1]) * 100
              * np.polyval(a_ice, T - T0)
            + (T <= c_ice[1]) * 100
              * (c_ice[3] + np.maximum(c_ice[2], T - T0)
                 * (c_ice[4] + np.maximum(c_ice[2], T - T0) * c_ice[5])))


def test_eliq_eice_match_reference_polynomials():
    T = np.linspace(150.0, 330.0, 721)
    np.testing.assert_allclose(np.asarray(thermo.eliq(jnp.asarray(T, jnp.float64))),
                               _np_eliq(T), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(thermo.eice(jnp.asarray(T, jnp.float64))),
                               _np_eice(T), rtol=1e-10)


def test_rh_roundtrip():
    T = jnp.asarray(np.linspace(200.0, 310.0, 60))
    p = jnp.asarray(np.linspace(2000.0, 1.0e5, 60))
    q = jnp.asarray(np.full(60, 1e-3))
    rh = thermo.specific_to_relative_humidity(q, T, p)
    q2 = thermo.relative_to_specific_humidity(rh, T, p)
    np.testing.assert_allclose(np.asarray(q2), np.asarray(q), rtol=1e-6)


def test_liquid_fraction_ramp():
    T = jnp.asarray([200.0, 253.16, 263.16, 273.16, 300.0])
    w = np.asarray(thermo.liquid_fraction(T))
    np.testing.assert_allclose(w, [0.0, 0.0, 0.5, 1.0, 1.0], atol=1e-6)


# ---------------------------------------------------------------- transforms

def test_cloud_exp_roundtrip():
    # keep q*lambda <~ 15 so 1-y stays representable for the roundtrip check
    lbd = jnp.asarray(np.linspace(1e3, 3e4, 60))
    q = jnp.asarray(np.abs(np.random.default_rng(0).normal(0, 1e-4, (8, 60))))
    y = transforms.cloud_exp_transform(q, lbd)
    q2 = transforms.cloud_exp_inverse(y, lbd)
    np.testing.assert_allclose(np.asarray(q2), np.asarray(q), rtol=1e-5)
    assert np.all(np.asarray(y) >= 0) and np.all(np.asarray(y) <= 1)


def test_v4_to_v5_inputs():
    rng = np.random.default_rng(1)
    x = jnp.asarray(np.abs(rng.normal(0, 1e-4, (4, 60, 6))))
    T = jnp.asarray(rng.uniform(200, 300, (4, 60)))
    lbd = jnp.asarray(np.full(60, 1e4))
    out = transforms.v4_to_v5_inputs(x, T, lbd)
    qn = np.asarray(x[..., 2] + x[..., 3])
    np.testing.assert_allclose(np.asarray(out[..., 2]),
                               1 - np.exp(-qn * 1e4), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out[..., 3]),
                               np.clip((np.asarray(T) - 253.16) / 20.0, 0, 1),
                               atol=1e-6)
    # other channels untouched
    np.testing.assert_array_equal(np.asarray(out[..., 0]), np.asarray(x[..., 0]))


# ------------------------------------------------------------- normalization

def test_normalizer_from_reference_files_v1():
    vs = V.get("v1")
    nz = Normalizer.from_files(
        vs,
        f"{NORM_DIR}/inputs/input_mean.nc",
        f"{NORM_DIR}/inputs/input_max.nc",
        f"{NORM_DIR}/inputs/input_min.nc",
        f"{NORM_DIR}/outputs/output_scale.nc",
        dtype=jnp.float64,
    )
    assert nz.mean.shape == (124,)
    assert nz.scale.shape == (128,)
    # ptend_t scale = cp = 1004.64 from the reference output_scale.nc
    np.testing.assert_allclose(np.asarray(nz.scale[:60]), 1004.64, rtol=1e-6)
    # roundtrip
    x = jnp.asarray(np.random.default_rng(2).normal(0, 1, 124))
    np.testing.assert_allclose(
        np.asarray(nz.denormalize_input(nz.normalize_input(x))),
        np.asarray(x), rtol=1e-10)


def test_level_normalizer_identity_shapes():
    vs = V.get("v4_rnn")
    nz = LevelNormalizer.identity(vs)
    x_lev = jnp.ones((384, 60, vs.inputs.n_lev_vars))
    x_sfc = jnp.ones((384, vs.inputs.n_sfc_vars))
    a, b = nz.normalize(x_lev, x_sfc)
    assert a.shape == x_lev.shape and b.shape == x_sfc.shape
    np.testing.assert_array_equal(np.asarray(a), np.asarray(x_lev))


def test_level_normalizer_from_files_v4():
    vs = V.get("v4_rnn")
    nz = LevelNormalizer.from_files(
        vs,
        f"{NORM_DIR}/inputs/input_mean_v4_pervar.nc",
        f"{NORM_DIR}/inputs/input_max_v4_pervar.nc",
        f"{NORM_DIR}/inputs/input_min_v4_pervar.nc",
        f"{NORM_DIR}/outputs/output_scale.nc",
    )
    assert nz.mean_lev.shape == (60, vs.inputs.n_lev_vars)
    assert np.all(np.asarray(nz.div_lev) != 0)
    assert np.all(np.isfinite(np.asarray(nz.div_lev)))


# ------------------------------------------------------------- conservation

def test_water_conservation_closes_on_constructed_sample():
    """Construct tendencies whose column water integral exactly balances
    precip; residual must vanish."""
    g = read_netcdf(GRID_PATH)
    hyai = jnp.asarray(g["hyai"]); hybi = jnp.asarray(g["hybi"])
    rng = np.random.default_rng(3)
    B, L = 16, 60
    y_lev = jnp.asarray(rng.normal(0, 1e-8, (B, L, 6)))
    sp = jnp.asarray(rng.uniform(9.5e4, 1.03e5, B))
    thick = conservation.layer_thickness(sp, hyai, hybi, 0.1019716213)
    water = jnp.sum(thick * jnp.sum(y_lev[:, :, 1:4], 2), 1)
    y_sfc = jnp.zeros((B, 8)).at[:, 3].set(-water / 1000.0)
    res = conservation.water_residual(y_lev, y_sfc, sp, hyai, hybi)
    np.testing.assert_allclose(np.asarray(res), 0.0, atol=1e-12)


def test_energy_residual_reference_formula():
    g = read_netcdf(GRID_PATH)
    hyai = jnp.asarray(g["hyai"]); hybi = jnp.asarray(g["hybi"])
    rng = np.random.default_rng(4)
    B = 8
    y_lev = jnp.asarray(rng.normal(0, 1e-6, (B, 60, 6)))
    y_sfc = jnp.asarray(np.abs(rng.normal(0, 1e-7, (B, 8))))
    sp = jnp.asarray(rng.uniform(9.5e4, 1.03e5, B))
    res = np.asarray(conservation.energy_residual(y_lev, y_sfc, sp, hyai, hybi))
    # independent numpy recomputation
    hy_a, hy_b = np.asarray(g["hyai"]), np.asarray(g["hybi"])
    thick = (1 / 9.8) * (np.asarray(sp)[:, None] * (hy_b[1:] - hy_b[:-1])
                         + 1e5 * (hy_a[1:] - hy_a[:-1]))
    yl, ys = np.asarray(y_lev), np.asarray(y_sfc)
    snow = 1000 * ys[:, 2]; prec = 1000 * ys[:, 3]; rain = prec - snow
    exp = (np.sum(thick * (yl[:, :, 0] * 1004.0 - yl[:, :, 2] * 2.5104e6
                           - yl[:, :, 3] * 2.8440e6), 1)
           - rain * 2.5104e6 - snow * 2.8440e6)
    np.testing.assert_allclose(res, exp, rtol=1e-5)


def test_conservation_mse_zero_for_identical():
    g = read_netcdf(GRID_PATH)
    hyai = jnp.asarray(g["hyai"]); hybi = jnp.asarray(g["hybi"])
    rng = np.random.default_rng(5)
    y_lev = jnp.asarray(rng.normal(0, 1e-6, (8, 60, 6)))
    y_sfc = jnp.asarray(np.abs(rng.normal(0, 1e-7, (8, 8))))
    sp = jnp.asarray(rng.uniform(9.5e4, 1.03e5, 8))
    mse = conservation.energy_conservation_mse(
        y_lev, y_sfc, y_lev, y_sfc, sp, hyai, hybi, timesteps=2)
    assert float(mse) == 0.0


def test_keeplev_chunks_prev_step_channels():
    """include_prev_inputs/outputs: each step's level inputs gain the
    previous timestep's first-N channels; chunks start at t>=1
    (rnn/utils.py:2095-2148)."""
    from climsim_tpu.data import keeplev_chunks
    rng = np.random.default_rng(0)
    T, B, L = 9, 4, 10
    xl = rng.normal(0, 1, (T, B, L, 6)).astype(np.float32)
    xs = rng.normal(0, 1, (T, B, 3)).astype(np.float32)
    yl = rng.normal(0, 1, (T, B, L, 5)).astype(np.float32)
    ys = rng.normal(0, 1, (T, B, 2)).astype(np.float32)
    sp = rng.normal(0, 1, (T, B)).astype(np.float32)
    chunks = list(keeplev_chunks(xl, xs, yl, ys, sp, chunk_size=4,
                                 shuffle=False, include_prev_inputs=6,
                                 include_prev_outputs=5))
    c = chunks[0]
    assert c["x_lev"].shape == (4, B, L, 6 + 5 + 6)
    # chunk starts at t=1; prev channels are t=0 values
    np.testing.assert_array_equal(c["x_lev"][0, ..., :6], xl[1])
    np.testing.assert_array_equal(c["x_lev"][0, ..., 6:11], yl[0])
    np.testing.assert_array_equal(c["x_lev"][0, ..., 11:], xl[0])
    np.testing.assert_array_equal(c["x_lev"][2, ..., 6:11], yl[2])


def test_fit_exp_lambdas_roundtrip(tmp_path):
    """Lambda derivation matches the reference notebook's recipe
    (1/conditional-mean above 1e-7, fill 1e7) and roundtrips through the
    reference txt format."""
    from climsim_tpu.data.normalization import (fit_exp_lambdas,
                                                save_exp_lambdas,
                                                load_exp_lambdas)
    rng = np.random.default_rng(0)
    q = np.abs(rng.normal(0, 2e-5, (500, 4, 60))).astype(np.float64)
    q[..., :10] = 0.0                      # cloud-free stratosphere
    lbd = fit_exp_lambdas(q)
    assert lbd.shape == (60,)
    np.testing.assert_allclose(lbd[:10], 1e7)
    col = q[..., 30].ravel()
    np.testing.assert_allclose(lbd[30], 1.0 / col[col > 1e-7].mean(),
                               rtol=1e-12)
    p = str(tmp_path / "qn_exp_lambda_large.txt")
    save_exp_lambdas(lbd, p)
    back = load_exp_lambdas(p)
    np.testing.assert_allclose(back, lbd, rtol=1e-5)


def test_load_exp_lambdas_reference_file():
    """Reads the reference's actual comma-separated lambda file."""
    from climsim_tpu.data.normalization import load_exp_lambdas
    lbd = load_exp_lambdas(
        "/root/reference/preprocessing/normalizations/inputs/"
        "qn_exp_lambda_large.txt")
    assert lbd.shape == (60,)
    np.testing.assert_allclose(lbd[:11], 1e7)   # cloud-free top levels
    assert np.all(lbd > 0)
