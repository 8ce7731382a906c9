"""Cross-implementation parity: our jnp physics vs the reference's own
torch code, executed directly from /root/reference (torch-cpu is present).

This is the strongest oracle available with the data blobs stripped
(SURVEY.md §7.3): identical inputs through both implementations must agree
to float32 tolerance. Covers the conservation metrics, the LW/SW solvers,
and the mp postprocessing temperature ramps.
"""
import sys

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference/rnn")

from climsim_tpu.physics import conservation, radiation  # noqa: E402
from climsim_tpu.io import read_netcdf  # noqa: E402

GRID_PATH = "/root/reference/grid_info/ClimSim_low-res_grid-info.nc"


@pytest.fixture(scope="module")
def grid_coeffs():
    g = read_netcdf(GRID_PATH)
    return np.asarray(g["hyai"], np.float64), np.asarray(g["hybi"],
                                                         np.float64)


def test_energy_metric_parity(grid_coeffs):
    """Our energy_conservation_mse == reference get_energy_metric
    (rnn/metrics.py:194-238) on identical inputs."""
    import metrics as ref_metrics  # /root/reference/rnn/metrics.py

    hyai, hybi = grid_coeffs
    rng = np.random.default_rng(0)
    B, L, T = 32, 60, 2
    yto = rng.normal(0, 1e-5, (B, L, 6)).astype(np.float32)
    ypo = rng.normal(0, 1e-5, (B, L, 6)).astype(np.float32)
    yto_sfc = np.abs(rng.normal(0, 1e-6, (B, 8))).astype(np.float32)
    ypo_sfc = np.abs(rng.normal(0, 1e-6, (B, 8))).astype(np.float32)
    sp = rng.uniform(9.6e4, 1.03e5, (B, 1)).astype(np.float32)

    em = ref_metrics.get_energy_metric(hyai.astype(np.float32),
                                       hybi.astype(np.float32),
                                       torch.device("cpu"))
    ref = float(em(torch.from_numpy(yto), torch.from_numpy(yto_sfc),
                   torch.from_numpy(ypo), torch.from_numpy(ypo_sfc),
                   torch.from_numpy(sp), T))

    ours = float(conservation.energy_conservation_mse(
        jnp.asarray(yto), jnp.asarray(yto_sfc), jnp.asarray(ypo),
        jnp.asarray(ypo_sfc), jnp.asarray(sp[:, 0]), jnp.asarray(hyai),
        jnp.asarray(hybi), timesteps=T))
    np.testing.assert_allclose(ours, ref, rtol=2e-4)


def test_water_conservation_parity(grid_coeffs):
    """Our water_residual == reference get_water_conservation diff
    (rnn/metrics.py:241-315)."""
    import metrics as ref_metrics

    hyai, hybi = grid_coeffs
    rng = np.random.default_rng(1)
    B, L, T = 24, 60, 2
    pred_lev = rng.normal(0, 1e-7, (B, L, 6)).astype(np.float32)
    pred_sfc = np.abs(rng.normal(0, 1e-7, (B, 8))).astype(np.float32)
    sp = rng.uniform(9.6e4, 1.03e5, (B, 1)).astype(np.float32)
    lhf = np.zeros((B,), np.float32)

    wc = ref_metrics.get_water_conservation(hyai.astype(np.float32),
                                            hybi.astype(np.float32),
                                            torch.device("cpu"))
    ref_diff = wc(torch.from_numpy(pred_lev), torch.from_numpy(pred_sfc),
                  torch.from_numpy(sp), torch.from_numpy(lhf), None, T)
    ref_diff = ref_diff.numpy()

    ours = np.asarray(conservation.water_residual(
        jnp.asarray(pred_lev), jnp.asarray(pred_sfc),
        jnp.asarray(sp[:, 0]), jnp.asarray(hyai), jnp.asarray(hybi)))
    # reference averages over the window (reshape(T,-1).mean(0))
    ours_windowed = ours.reshape(T, -1).mean(0)
    np.testing.assert_allclose(ours_windowed, ref_diff, rtol=2e-4,
                               atol=1e-12)


def test_lw_solver_parity():
    """Our lw_solver_noscat == reference lw_solver_noscat_batchlast
    (physics_rad.py:96-131) on identical inputs (they use level-first
    layout; we transpose)."""
    sys.path.insert(0, "/root/reference/rnn/models")
    import importlib
    import physics_rad as ref_rad  # noqa: E402

    rng = np.random.default_rng(2)
    B, L = 16, 30
    planck_top = np.abs(rng.normal(50, 10, (L, B))).astype(np.float32)
    planck_bot = np.abs(rng.normal(50, 10, (L, B))).astype(np.float32)
    od = np.abs(rng.normal(0.3, 0.1, (L, B))).astype(np.float32)
    sfc = np.abs(rng.normal(400, 20, (B,))).astype(np.float32)
    emis = np.ones((B,), np.float32)

    # reference source terms + solver (torch.compile falls back to eager
    # on CPU without a compiler; call the underlying python)
    sup_r, sdn_r, trans_r = ref_rad.reftrans_lw(
        torch.from_numpy(planck_top), torch.from_numpy(planck_bot),
        torch.from_numpy(od))
    fdn_r, fup_r = ref_rad.lw_solver_noscat_batchlast(
        trans_r, sdn_r, sup_r, torch.from_numpy(sfc),
        torch.from_numpy(emis))

    sup_o, sdn_o, trans_o = radiation.reftrans_lw(
        jnp.asarray(planck_top.T), jnp.asarray(planck_bot.T),
        jnp.asarray(od.T))
    np.testing.assert_allclose(np.asarray(sup_o), sup_r.numpy().T,
                               rtol=1e-5)
    fdn_o, fup_o = radiation.lw_solver_noscat(
        trans_o, sdn_o, sup_o, jnp.asarray(sfc), jnp.asarray(emis))
    np.testing.assert_allclose(np.asarray(fdn_o), fdn_r.numpy().T,
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(fup_o), fup_r.numpy().T,
                               rtol=1e-5, atol=1e-5)


def test_sw_reftrans_parity():
    """Our Meador-Weaver two-stream == reference calc_ref_trans_sw
    (physics_rad.py:139-245)."""
    sys.path.insert(0, "/root/reference/rnn/models")
    import physics_rad as ref_rad

    rng = np.random.default_rng(3)
    shape = (20, 16)
    mu0 = rng.uniform(0.2, 1.0, shape).astype(np.float32)
    od = np.abs(rng.normal(0.3, 0.2, shape)).astype(np.float32) + 0.01
    ssa = rng.uniform(0.3, 0.999, shape).astype(np.float32)
    g = rng.uniform(0.0, 0.85, shape).astype(np.float32)

    ref = ref_rad.calc_ref_trans_sw(torch.from_numpy(mu0),
                                    torch.from_numpy(od),
                                    torch.from_numpy(ssa),
                                    torch.from_numpy(g))
    ours = radiation.calc_ref_trans_sw(jnp.asarray(mu0), jnp.asarray(od),
                                       jnp.asarray(ssa), jnp.asarray(g))
    for o, r, name in zip(ours, ref, ("rd", "td", "rdir", "tdd", "tdir")):
        np.testing.assert_allclose(np.asarray(o), r.numpy(), rtol=2e-4,
                                   atol=2e-6, err_msg=name)


def test_eliq_eice_parity_vs_reference_wrapper():
    """Our thermo polynomials vs the torch versions in the wrapper utils
    (rnn/utils.py eliq/eice, if importable) — falls back to the
    climsim_utils formulas already covered in test_core."""
    from climsim_tpu.physics import thermo

    T = np.linspace(160.0, 330.0, 341).astype(np.float32)
    # reference rnn/utils.py defines torch eliq/eice inside
    # relative_to_specific_humidity; replicate the polynomial directly
    a_liq = [-0.976195544e-15, -0.952447341e-13, 0.640689451e-10,
             0.206739458e-7, 0.302950461e-5, 0.264847430e-3,
             0.142986287e-1, 0.443987641, 6.11239921]
    tt = torch.from_numpy(np.maximum(-80.0, T - 273.16))
    acc = torch.zeros_like(tt) + a_liq[0]
    for c in a_liq[1:]:
        acc = acc * tt + c
    ref = (100.0 * acc).numpy()
    ours = np.asarray(thermo.eliq(jnp.asarray(T)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def _ref_ens_layout(ens, T, B):
    """Our member-major ens [M, T*B, ...] -> the reference trainer's flat
    prediction layout (T, M, B, ...) -> [(T*M*B), ...] (repeat_interleave
    over the batch, rnn/utils.py:1064-1072)."""
    M = ens.shape[0]
    e = ens.reshape((M, T, B) + ens.shape[2:])
    e = np.swapaxes(e, 0, 1)                       # [T, M, B, ...]
    return e.reshape((T * M * B,) + ens.shape[2:])


def test_crps_l1_parity_vs_reference():
    """crps_kernel(fair, M=2) == reference CRPS_l1 (which estimates the
    spread from the first two members; at M=2 the fair kernel spread
    reduces to exactly |X0-X1|, rnn/metrics.py:628-700)."""
    import metrics as ref_metrics
    from climsim_tpu.train.probabilistic import crps_kernel
    rng = np.random.default_rng(0)
    T, B, M, L, ny, ns = 3, 8, 2, 10, 4, 5
    obs_lev = rng.normal(0, 1, (T * B, L, ny)).astype(np.float32)
    obs_sfc = rng.normal(0, 1, (T * B, ns)).astype(np.float32)
    ens_lev = rng.normal(0, 1, (M, T * B, L, ny)).astype(np.float32)
    ens_sfc = rng.normal(0, 1, (M, T * B, ns)).astype(np.float32)

    ref = ref_metrics.CRPS_l1(
        torch.from_numpy(obs_lev), torch.from_numpy(obs_sfc),
        torch.from_numpy(_ref_ens_layout(ens_lev, T, B)),
        torch.from_numpy(_ref_ens_layout(ens_sfc, T, B)), T)

    # ours: concatenate (lev flattened, sfc) on the feature axis as the
    # reference does, then the fair L1-kernel CRPS
    ours_ens = np.concatenate(
        [ens_lev.reshape(M, T * B, L * ny), ens_sfc], axis=-1)
    ours_obs = np.concatenate([obs_lev.reshape(T * B, L * ny), obs_sfc],
                              axis=-1)
    ours = crps_kernel(jnp.asarray(ours_ens), jnp.asarray(ours_obs),
                       fair=True)
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_energy_crps_parity_vs_reference():
    """energy_score == reference CRPS (the cdist form is the multivariate
    energy score: 2*E||y-X||_2 - fair spread, all scaled by 1/sqrt(D);
    rnn/metrics.py:535-626)."""
    import metrics as ref_metrics
    from climsim_tpu.train.probabilistic import energy_score
    rng = np.random.default_rng(1)
    T, B, M, L, ny, ns = 2, 6, 4, 8, 3, 5
    obs_lev = rng.normal(0, 1, (T * B, L, ny)).astype(np.float32)
    obs_sfc = rng.normal(0, 1, (T * B, ns)).astype(np.float32)
    ens_lev = rng.normal(0, 1, (M, T * B, L, ny)).astype(np.float32)
    ens_sfc = rng.normal(0, 1, (M, T * B, ns)).astype(np.float32)
    ref = ref_metrics.CRPS(
        torch.from_numpy(obs_lev), torch.from_numpy(obs_sfc),
        torch.from_numpy(_ref_ens_layout(ens_lev, T, B)),
        torch.from_numpy(_ref_ens_layout(ens_sfc, T, B)), T,
        beta=1, alpha=1.0)
    D = L * ny + ns
    ours_ens = np.concatenate(
        [ens_lev.reshape(M, T * B, L * ny), ens_sfc], axis=-1)
    ours_obs = np.concatenate([obs_lev.reshape(T * B, L * ny), obs_sfc],
                              axis=-1)
    ours = energy_score(jnp.asarray(ours_ens), jnp.asarray(ours_obs))
    np.testing.assert_allclose(2.0 / np.sqrt(D) * float(ours), float(ref),
                               rtol=1e-4)


def test_spread_skill_parity_vs_reference():
    """spread_skill_ratio == reference compute_spread_skill_ratio
    (spread/rmse with the sqrt((M+1)/M) inflation; rnn/metrics.py:487-533).
    NOTE the reference's member layout here is (T, M, B) WITHOUT the
    transpose used by the CRPS functions."""
    import metrics as ref_metrics
    from climsim_tpu.train.probabilistic import spread_skill_ratio
    rng = np.random.default_rng(2)
    T, B, M, L, ny, ns = 2, 6, 4, 8, 3, 5
    obs_lev = rng.normal(0, 1, (T * B, L, ny)).astype(np.float32)
    obs_sfc = rng.normal(0, 1, (T * B, ns)).astype(np.float32)
    ens_lev = rng.normal(0, 1, (M, T * B, L, ny)).astype(np.float32)
    ens_sfc = rng.normal(0, 1, (M, T * B, ns)).astype(np.float32)

    # reference flat layout (T, M, B, D) without member/batch transpose
    def flat(e):
        M_ = e.shape[0]
        r = e.reshape((M_, T, B) + e.shape[2:])
        r = np.swapaxes(r, 0, 1)
        return r.reshape((T * M_ * B,) + e.shape[2:])

    spread, rmse = ref_metrics.compute_spread_skill_ratio(
        torch.from_numpy(obs_lev), torch.from_numpy(obs_sfc),
        torch.from_numpy(flat(ens_lev)), torch.from_numpy(flat(ens_sfc)), T)
    M_ = M
    ref_ratio = float(spread) * 1.0 / float(rmse)

    ours_ens = np.concatenate(
        [ens_lev.reshape(M, T * B, L * ny), ens_sfc], axis=-1)
    ours_obs = np.concatenate([obs_lev.reshape(T * B, L * ny), obs_sfc],
                              axis=-1)
    ours = spread_skill_ratio(jnp.asarray(ours_ens), jnp.asarray(ours_obs))
    np.testing.assert_allclose(float(ours), ref_ratio, rtol=1e-4)


def test_precip_sum_mse_parity_vs_reference():
    """The rollout w_precip term == reference precip_sum_mse
    (rnn/metrics.py:184-190)."""
    import metrics as ref_metrics
    rng = np.random.default_rng(3)
    T, B, ns = 4, 8, 8
    true_sfc = rng.normal(0, 1, (T * B, ns)).astype(np.float32)
    pred_sfc = rng.normal(0, 1, (T * B, ns)).astype(np.float32)
    ref = float(ref_metrics.precip_sum_mse(
        torch.from_numpy(true_sfc), torch.from_numpy(pred_sfc), T))
    # ours (train/rollout.py w_precip): sum over window of channel 3,
    # mse, / W^2
    pt = pred_sfc.reshape(T, B, ns)[..., 3].sum(0)
    tt = true_sfc.reshape(T, B, ns)[..., 3].sum(0)
    ours = float(np.mean((pt - tt) ** 2) / (T * T))
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_corrcoeff_pairs_parity_vs_reference():
    """epoch_metrics' per-level correlation R2 profile ==
    corrcoeff_pairs_batchfirst**2 (rnn/metrics.py:15-37)."""
    import metrics as ref_metrics
    from climsim_tpu.train.epoch_metrics import epoch_metrics
    rng = np.random.default_rng(4)
    N, L, ny = 64, 12, 6
    t = rng.normal(0, 1, (N, L, ny)).astype(np.float32)
    p = (t + 0.5 * rng.normal(0, 1, (N, L, ny))).astype(np.float32)
    ref = ref_metrics.corrcoeff_pairs_batchfirst(p, t) ** 2
    m = epoch_metrics(jnp.asarray(p), jnp.zeros((N, 8)), jnp.asarray(t),
                      jnp.zeros((N, 8)), jnp.full(N, 1e5),
                      np.linspace(0, 1, L + 1), np.linspace(0, 1, L + 1))
    np.testing.assert_allclose(np.asarray(m["r2_lev"]), ref, rtol=1e-4,
                               atol=1e-6)
