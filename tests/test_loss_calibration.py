"""Conservation-loss calibration at REALISTIC physical magnitudes.

The conservation terms (physics/conservation.py) operate on RAW
(denormalized) tendencies, so their numeric scale is set by the real
output normalization — not by whatever synthetic scaling a test uses.
These tests drive them with the REFERENCE's own normalization files
(preprocessing/normalizations/*.nc) and the reference's published loss
weights (rnn/conf/autoreg_LSTM.yaml: w_hcon=5e-6, w_wcon=3e7) and check
the weighted terms land in a trainable band relative to the main loss —
i.e. the reference weights transfer to this implementation as-is.
"""
import jax.numpy as jnp
import numpy as np

from climsim_tpu import variables as V
from climsim_tpu.data.normalization import LevelNormalizer
from climsim_tpu.io import read_netcdf
from climsim_tpu.physics.conservation import (energy_conservation_mse,
                                              water_conservation_mse,
                                              water_residual)
from climsim_tpu.train.losses import LOSS_FNS

NORM_DIR = "/root/reference/preprocessing/normalizations"
GRID_PATH = "/root/reference/grid_info/ClimSim_low-res_grid-info.nc"

# the reference's published weights (rnn/conf/autoreg_LSTM.yaml:34,38)
W_HCON_REF = 5.0e-6
W_WCON_REF = 3.0e7


def _realistic_batch(seed=0, B=384, L=60, model_err=0.3):
    """Raw-units (truth, prediction) tendency pair at mid-training
    realism: the TRUTH closes the water budget exactly (real physics
    does), the PREDICTION is truth + model_err x channel-scaled noise —
    the regime where the conservation penalties actually operate. Raw
    magnitudes come from the REAL output scales (raw = normalized/scale,
    exactly the trainer's denormalization, train/rollout.py)."""
    vs = V.get("v4_rnn")
    nz = LevelNormalizer.from_files(
        vs,
        f"{NORM_DIR}/inputs/input_mean_v4_pervar.nc",
        f"{NORM_DIR}/inputs/input_max_v4_pervar.nc",
        f"{NORM_DIR}/inputs/input_min_v4_pervar.nc",
        f"{NORM_DIR}/outputs/output_scale.nc")
    rng = np.random.default_rng(seed)
    ny = vs.outputs.n_lev_vars
    nys = vs.outputs.n_sfc_vars
    y_raw = jnp.asarray(rng.normal(0, 1, (B, L, ny)),
                        jnp.float32) / nz.scale_lev
    ys_raw = jnp.asarray(rng.normal(0, 1, (B, nys)),
                         jnp.float32) / nz.scale_sfc
    sp = jnp.asarray(rng.uniform(9.6e4, 1.03e5, (B,)), jnp.float32)
    g = read_netcdf(GRID_PATH)
    hyai, hybi = jnp.asarray(g["hyai"]), jnp.asarray(g["hybi"])
    # close the truth's water budget exactly: precip balances the column
    # total-water tendency integral (residual == 0 by construction)
    resid = water_residual(y_raw, ys_raw, sp, hyai, hybi)
    ys_raw = ys_raw.at[:, 3].add(-resid / 1000.0)
    p_raw = y_raw + model_err * jnp.asarray(
        rng.normal(0, 1, (B, L, ny)), jnp.float32) / nz.scale_lev
    ps_raw = ys_raw + model_err * jnp.asarray(
        rng.normal(0, 1, (B, nys)), jnp.float32) / nz.scale_sfc
    # normalized versions for the main loss (normalized = raw * scale)
    y_n, p_n = y_raw * nz.scale_lev, p_raw * nz.scale_lev
    ys_n, ps_n = ys_raw * nz.scale_sfc, ps_raw * nz.scale_sfc
    return (y_n, p_n, ys_n, ps_n, y_raw, p_raw, ys_raw, ps_raw, sp,
            hyai, hybi)


def test_raw_magnitudes_match_climsim():
    """Sanity: the denormalized tendencies sit at ClimSim physical
    scales (dT/dt ~1e-3 K/s at unit normalized amplitude since the
    ptend_t scale is cp; dq/dt ~<=1e-6 s^-1)."""
    (_, _, _, _, y_raw, _, ys_raw, _, _, _, _) = _realistic_batch()
    sT = float(jnp.std(y_raw[..., 0]))
    assert 1e-4 < sT < 1e-2, sT                  # 1/cp ~ 1e-3
    sq = float(jnp.std(y_raw[..., 1]))
    assert 1e-9 < sq < 1e-5, sq


def test_truth_water_budget_closes():
    (_, _, _, _, y_raw, _, ys_raw, _, sp, hyai, hybi) = _realistic_batch()
    r = water_residual(y_raw, ys_raw, sp, hyai, hybi)
    assert float(jnp.abs(r).max()) < 1e-8


def test_reference_weights_give_trainable_terms():
    """With the reference's w_hcon/w_wcon the weighted conservation terms
    are (a) nonzero, (b) within two orders of the main huber loss at a
    30% model error — neither vanishing nor drowning it. This is the
    calibration the synthetic-normalization defaults could not
    establish."""
    (y_n, p_n, ys_n, ps_n, y_raw, p_raw, ys_raw, ps_raw, sp,
     hyai, hybi) = _realistic_batch()
    main = float(LOSS_FNS["huber"](p_n, y_n)
                 + LOSS_FNS["huber"](ps_n, ys_n))
    h_con = float(energy_conservation_mse(y_raw, ys_raw, p_raw, ps_raw,
                                          sp, hyai, hybi))
    w_con = float(water_conservation_mse(p_raw, ps_raw, sp, hyai, hybi))
    wh = W_HCON_REF * h_con
    ww = W_WCON_REF * w_con
    assert wh > 0 and ww > 0
    # trainable band: within [1e-4, 1e2] x main loss
    assert 1e-4 * main < wh < 1e2 * main, (wh, main)
    assert 1e-4 * main < ww < 1e2 * main, (ww, main)


def test_conf_defaults_are_reference_calibrated():
    """The shipped rollout confs carry the reference-calibrated weights
    (not the old synthetic-normalization placeholders)."""
    import yaml
    for name in ("autoreg_longwindows", "autoreg_physrnn"):
        with open(f"conf/{name}.yaml") as f:
            cfg = yaml.safe_load(f)
        tr = cfg["loss"]
        assert float(tr["w_hcon"]) == W_HCON_REF, name
        assert float(tr["w_wcon"]) == W_WCON_REF, name
