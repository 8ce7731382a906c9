"""Metric/weighting tests against independent numpy implementations of the
reference estimators (data_utils.py:1843-1935) and weighting chain
(:1523-1725)."""
import numpy as np
import jax.numpy as jnp

from climsim_tpu import variables as V
from climsim_tpu.grid import Grid
from climsim_tpu.metrics import (mae, rmse, r2, bias, crps, weight_outputs,
                                 split_variables, evaluate)

GRID_PATH = "/root/reference/grid_info/ClimSim_low-res_grid-info.nc"


def _fake(T=6, N=384, ny=128, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.normal(0, 1, (T, N, ny)), rng.normal(0, 1, (T, N, ny)),
            rng.uniform(9.6e4, 1.03e5, (T, N)))


def test_estimators_match_numpy():
    rng = np.random.default_rng(7)
    p = rng.normal(0, 1, (10, 384, 60))
    t = rng.normal(0, 1, (10, 384, 60))
    np.testing.assert_allclose(np.asarray(mae(jnp.asarray(p), jnp.asarray(t))),
                               np.abs(p - t).mean(0).mean(0), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(rmse(jnp.asarray(p), jnp.asarray(t))),
                               np.sqrt(((p - t) ** 2).mean(0)).mean(0),
                               rtol=1e-10)
    sq = ((p - t) ** 2).sum(0)
    tss = ((t - t.mean(0)) ** 2).sum(0)
    np.testing.assert_allclose(np.asarray(r2(jnp.asarray(p), jnp.asarray(t))),
                               (1 - sq / tss).mean(0), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(bias(jnp.asarray(p), jnp.asarray(t))),
                               (p.mean(0) - t.mean(0)).mean(0), rtol=1e-9)


def test_crps_matches_reference_estimator():
    rng = np.random.default_rng(8)
    S = 16
    sp = rng.normal(0, 1, (5, 384, S))
    t = rng.normal(0, 1, (5, 384))
    got = np.asarray(crps(jnp.asarray(sp), jnp.asarray(t)))
    # independent numpy version of data_utils.calc_CRPS
    mae_np = np.mean(np.abs(sp - t[..., None]), axis=(0, -1))
    s = np.sort(sp, axis=-1)
    diff = s[..., 1:] - s[..., :-1]
    count = np.arange(1, S) * np.arange(S - 1, 0, -1)
    spread = (diff * count).sum(-1).mean(0)
    exp = (mae_np - spread / (S * (S - 1))).mean(0)
    np.testing.assert_allclose(got, exp, rtol=1e-9)


def test_crps_of_perfect_deterministic_forecast_is_zero():
    t = np.random.default_rng(9).normal(0, 1, (4, 384))
    sp = np.repeat(t[..., None], 8, axis=-1)
    np.testing.assert_allclose(np.asarray(crps(jnp.asarray(sp), jnp.asarray(t))),
                               0.0, atol=1e-12)


def test_weighting_chain_v1():
    g = Grid.from_file(GRID_PATH, dtype=jnp.float64)
    vs = V.get("v1")
    p, t, ps = _fake(ny=128)
    scale = np.abs(np.random.default_rng(1).normal(1, 0.1, 128))
    w = np.asarray(weight_outputs(jnp.asarray(p), jnp.asarray(ps), vs, g,
                                  jnp.asarray(scale)))
    # numpy reference of the chain for ptend_t block and NETSW scalar
    hyai, hybi = np.asarray(g.hyai), np.asarray(g.hybi)
    pint = 1e5 * hyai[None, None, :] + hybi[None, None, :] * ps[..., None]
    dp = pint[..., 1:] - pint[..., :-1]
    aw = np.asarray(g.area_wgt)
    exp_t = (p[..., :60] / scale[:60]) * (dp / 9.80616) * aw[None, :, None] \
        * 1.00464e3
    np.testing.assert_allclose(w[..., :60], exp_t, rtol=1e-9)
    exp_netsw = (p[..., 120] / scale[120]) * aw[None, :] * 1.0
    np.testing.assert_allclose(w[..., 120], exp_netsw, rtol=1e-9)
    # precip: Lv * rho_h2o
    exp_precc = (p[..., 123] / scale[123]) * aw[None, :] * (2.501e6 * 1e3)
    np.testing.assert_allclose(w[..., 123], exp_precc, rtol=1e-9)


def test_split_variables_shapes():
    vs = V.get("v1")
    y = jnp.zeros((3, 384, 128))
    d = split_variables(y, vs)
    assert d["ptend_t"].shape == (3, 384, 60)
    assert d["cam_out_NETSW"].shape == (3, 384)


def test_evaluate_dataframe():
    g = Grid.from_file(GRID_PATH)
    vs = V.get("v1")
    p, t, ps = _fake(T=4)
    df = evaluate(jnp.asarray(p), jnp.asarray(t), jnp.asarray(ps), vs, g)
    assert set(df.columns) == {"MAE", "RMSE", "R2", "bias"}
    assert list(df.index) == list(vs.outputs.names)
    # identical pred/target -> zero error, R2 = 1
    df2 = evaluate(jnp.asarray(t), jnp.asarray(t), jnp.asarray(ps), vs, g)
    assert np.allclose(df2["MAE"], 0) and np.allclose(df2["R2"], 1)


def test_evaluate_with_crps_samples():
    g = Grid.from_file(GRID_PATH)
    vs = V.get("v1")
    p, t, ps = _fake(T=2)
    sp = np.repeat(t[..., None], 4, -1)  # perfect ensemble
    df = evaluate(jnp.asarray(p), jnp.asarray(t), jnp.asarray(ps), vs, g,
                  samplepreds=jnp.asarray(sp))
    assert "CRPS" in df.columns
    np.testing.assert_allclose(df["CRPS"], 0.0, atol=1e-10)
