"""FULL-FORWARD weight-copy parity: our PhysicalRNNAutoreg vs the
reference physical_RNN_autoreg (rnn/models/models_phys.py:25-706,
1548-1788) executed in place, non-physrad configuration.

Pins the entire physics forward: 60-level trunk with zero-padded memory,
add_pres feature, surface-MLP up-sweep init (down-sweep hidden zeroed on
both sides — the reference uses torch.randn, patched to zeros), the
subgrid decomposition with mean-preserving rescale, mass-flux/eddy
vertical fluxes with zero BCs, the ORDERED positivity clamp chain, the
latent-heat conservation assembly (reference Lv/Ls/g constants), the
semi-prognostic precipitation pool with release fraction and Pmax, the
ML radiation emulation heads, and the output layout.
"""
import sys
import types

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

# omegaconf stub (reference models only attribute-access DictConfig)
_oc = types.ModuleType("omegaconf")


class _DictConfig(dict):
    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e


_oc.DictConfig = _DictConfig
_oc.OmegaConf = types.SimpleNamespace(create=lambda d=None: _DictConfig(d or {}))
sys.modules.setdefault("omegaconf", _oc)
sys.path.insert(0, "/root/reference/rnn")

from climsim_tpu.grid import Grid  # noqa: E402
from climsim_tpu.models.phys_rnn import PhysicalRNNAutoreg  # noqa: E402

GRID_PATH = "/root/reference/grid_info/ClimSim_low-res_grid-info.nc"

NX, NX_SFC, NY, NY_SFC = 9, 24, 5, 8
NH = 24
NH_MEM = 8          # our latent width == reference nh_mem0 (nh_mem - 1)
NREG = 4
L, LC, B = 60, 50, 6
YS_T, YS_QV, YS_QN, YS_PREC = 3.0e4, 2.0e8, 1.5e8, 1.0e8


def _coeffs(g):
    ylev = np.ones((L, NY), np.float32)
    ylev[:, 0] = YS_T
    ylev[:, 1] = YS_QV
    ylev[:, 2] = YS_QN
    ysca = np.ones(NY_SFC, np.float32)
    ysca[3] = YS_PREC
    z = lambda *s: np.zeros(s, np.float32)
    return {
        "yscale_lev": ylev, "yscale_sca": ysca,
        "xmean_lev": z(L, NX), "xmean_sca": z(NX_SFC),
        "xdiv_lev": np.ones((L, NX), np.float32),
        "xdiv_sca": np.ones(NX_SFC, np.float32),
        "hyai": np.asarray(g.hyai, np.float32),
        "hybi": np.asarray(g.hybi, np.float32),
        "hyam": np.asarray(g.hyam, np.float32),
        "hybm": np.asarray(g.hybm, np.float32),
        "lbd_qc": np.ones(L, np.float32),
        "lbd_qi": np.ones(L, np.float32),
        "lbd_qn": np.ones(L, np.float32),
    }


def _ref_model(g, **kw):
    # models_phys.py lives in the reference's `models` PACKAGE (relative
    # imports to .models/.physics_rad) and absolute-imports rnn/layers.py —
    # evict any foreign 'layers' entry (the U-Net parity test loads the
    # online_testing EDM layers under that name)
    lay = sys.modules.get("layers")
    if lay is not None and "online_testing" in getattr(lay, "__file__",
                                                       "" ) :
        del sys.modules["layers"]
    # other parity tests may have imported rnn/models/models.py as a
    # top-level 'models' MODULE, which shadows the package route
    m = sys.modules.get("models")
    if m is not None and not hasattr(m, "__path__"):
        del sys.modules["models"]
    import importlib

    mod = importlib.import_module("models.models_phys")

    cfg = _DictConfig(
        ny=NY, nlev=L, nx=NX, nx_sfc=NX_SFC, ny_sfc=NY_SFC,
        nneur=[NH, NH], nh_mem=NH_MEM + 1,   # + stored-precip slot
        use_initial_mlp=True, add_pres=True, output_prune=False,
        use_lstm=False, add_stochastic_layer=False, ensemble_size=1,
        mp_mode=1, separate_radiation=False, use_physrad=False,
        concat=False, autoregressive=True,
        nreg=NREG, ice_sedimentation=True,
        pred_subgrid_temp=kw.get("pred_subgrid_temp", True),
        use_clear_sky_region=True,
        pred_subgrid_liq_frac=kw.get("pred_subgrid_liq_frac", False),
        ng_lw=4, ng_sw=4,
    )
    return mod.physical_RNN_autoreg(cfg, _coeffs(g), torch.device("cpu"))


def _copy_dense(tmod, fp, name):
    k = np.asarray(fp[name]["kernel"])
    b = np.asarray(fp[name]["bias"])
    tmod.weight.data = torch.from_numpy(k.T.copy())
    tmod.bias.data = torch.from_numpy(b.copy())


def _copy_gru(tgru, fp, layer_name):
    lp = fp[layer_name]
    tgru.weight_ih_l0.data = torch.from_numpy(
        np.asarray(lp["input_proj"]["kernel"]).T.copy())
    tgru.bias_ih_l0.data = torch.from_numpy(
        np.asarray(lp["input_proj"]["bias"]).copy())
    tgru.weight_hh_l0.data = torch.from_numpy(
        np.asarray(lp["cell"]["hh"]["kernel"]).T.copy())
    tgru.bias_hh_l0.data = torch.from_numpy(
        np.asarray(lp["cell"]["hh"]["bias"]).copy())


import pytest as _pytest


@_pytest.mark.parametrize("subgrid_liq,subgrid_temp",
                          [(False, True), (True, False)])
def test_physical_rnn_full_forward_parity(subgrid_liq, subgrid_temp):
    g = Grid.from_file(GRID_PATH)
    tt = lambda a: tuple(float(x) for x in np.asarray(a))
    ours = PhysicalRNNAutoreg(
        nx=NX, nx_sfc=NX_SFC, ny=NY, ny_sfc=NY_SFC, nneur=(NH, NH),
        nh_mem=NH_MEM, nreg=NREG, use_clear_sky_region=True,
        pred_subgrid_temp=subgrid_temp,
        pred_subgrid_liq_frac=subgrid_liq,
        ice_sedimentation=True, store_precip=True,
        allow_extra_heating=True,        # reference non-physrad hardcodes
        add_pres=True, use_physrad=False, separate_radiation=False,
        hyai=tt(g.hyai), hybi=tt(g.hybi), hyam=tt(g.hyam),
        hybm=tt(g.hybm), sp_mean=0.0, sp_div=1.0,
        yscale_t=YS_T, yscale_qv=YS_QV, yscale_qn=YS_QN,
        yscale_precc=YS_PREC, qv_channel=NX - 1)

    rng = np.random.default_rng(0)
    xm = rng.normal(0, 1, (B, L, NX)).astype(np.float32)
    xs = rng.normal(0, 1, (B, NX_SFC)).astype(np.float32)
    xs[:, 0] = rng.uniform(9.6e4, 1.03e5, B)    # raw ps channel
    mem = rng.normal(0, 1, (B, LC, NH_MEM + 1)).astype(np.float32)
    mem[:, :, -1] = np.abs(mem[:, :, -1]) * 1e-3   # stored precip >= 0
    xd = rng.normal(0, 1, (B, L, NX)).astype(np.float32)
    xd[..., 0] = rng.uniform(210, 300, (B, L))     # T
    xd[..., 2] = rng.uniform(0, 1e-4, (B, L))      # qliq
    xd[..., 3] = rng.uniform(0, 1e-4, (B, L))      # qice
    xd[..., NX - 1] = rng.uniform(1e-6, 1e-2, (B, L))   # qv (last channel)

    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(xm),
                       jnp.asarray(xs), jnp.asarray(mem), jnp.asarray(xd))
    fp = params["params"]
    # reference down-sweep hidden is torch.randn -> patched to zeros;
    # zero our TOA-init head so hx2 == 0 as well
    fp = dict(fp)
    fp["mlp_toa1"] = {
        "kernel": jnp.zeros_like(fp["mlp_toa1"]["kernel"]),
        "bias": jnp.zeros_like(fp["mlp_toa1"]["bias"])}
    params = {"params": fp}

    ref = _ref_model(g, pred_subgrid_temp=subgrid_temp,
                     pred_subgrid_liq_frac=subgrid_liq)
    _copy_dense(ref.mlp_initial, fp, "mlp_initial")
    _copy_dense(ref.mlp_surface1, fp, "mlp_surface1")
    _copy_dense(ref.mlp_latent, fp, "mlp_latent")
    _copy_dense(ref.mlp_output, fp, "mlp_output")
    _copy_gru(ref.rnn1, fp, "rnn_up")
    _copy_gru(ref.rnn2, fp, "rnn_down")
    _copy_dense(ref.mlp_output_rad, fp, "mlp_output_rad")
    _copy_dense(ref.mlp_surface_output_rad, fp, "mlp_surface_output_rad")
    names = ["mlp_qv_crm", "mlp_qn_crm", "mlp_qice_crm",
             "mlp_sed_qn_crm", "mlp_massflux", "mlp_eddy_diff",
             "mlp_evap_prec_crm", "mlp_evap_cond_vapor_crm",
             "mlp_mp_aa_crm", "mlp_subgrid_area_frac",
             "mlp_precip_release"]
    if subgrid_temp:
        names.append("mlp_t_crm")
    if subgrid_liq:
        names.append("mlp_liq_frac_crm")
    for n in names:
        _copy_dense(getattr(ref, n), fp, n)
    ref.eval()

    out_o, sfc_o, mem_o, aux_o = ours.apply(
        params, jnp.asarray(xm), jnp.asarray(xs), jnp.asarray(mem),
        jnp.asarray(xd))

    try:
        import importlib
        importlib.import_module("torch._dynamo").config.disable = True
    except Exception:
        pass
    orig_randn = torch.randn
    torch.randn = lambda *a, **k: torch.zeros(
        *a, **{kk: vv for kk, vv in k.items() if kk != "device"})
    try:
        with torch.no_grad():
            out_r, sfc_r, mem_r, pneg_r = ref([
                torch.from_numpy(xm), torch.from_numpy(xs),
                torch.from_numpy(np.swapaxes(mem, 0, 1).copy()),
                torch.from_numpy(xd)])
    finally:
        torch.randn = orig_randn

    assert float(jnp.abs(out_o).max()) > 1e-3, "vacuous outputs"
    np.testing.assert_allclose(np.asarray(out_o), out_r.numpy(),
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(sfc_o), sfc_r.numpy(),
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(mem_o),
                               np.swapaxes(mem_r.numpy(), 0, 1),
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(aux_o["prec_negative"]),
                               pneg_r.numpy(), rtol=2e-3, atol=2e-4)


def test_physical_rnn_rollout_parity():
    """3 coupled steps with the memory (latent + stored-precip pool)
    threaded between steps on both sides — pins the autoregressive
    contract of the physics model."""
    g = Grid.from_file(GRID_PATH)
    tt = lambda a: tuple(float(x) for x in np.asarray(a))
    ours = PhysicalRNNAutoreg(
        nx=NX, nx_sfc=NX_SFC, ny=NY, ny_sfc=NY_SFC, nneur=(NH, NH),
        nh_mem=NH_MEM, nreg=NREG, use_clear_sky_region=True,
        pred_subgrid_temp=True, ice_sedimentation=True, store_precip=True,
        allow_extra_heating=True, add_pres=True,
        hyai=tt(g.hyai), hybi=tt(g.hybi), hyam=tt(g.hyam),
        hybm=tt(g.hybm), sp_mean=0.0, sp_div=1.0,
        yscale_t=YS_T, yscale_qv=YS_QV, yscale_qn=YS_QN,
        yscale_precc=YS_PREC, qv_channel=NX - 1)

    rng = np.random.default_rng(7)
    T = 3
    xm = rng.normal(0, 1, (T, B, L, NX)).astype(np.float32)
    xs = rng.normal(0, 1, (T, B, NX_SFC)).astype(np.float32)
    xs[..., 0] = rng.uniform(9.6e4, 1.03e5, (T, B))
    xd = rng.normal(0, 1, (T, B, L, NX)).astype(np.float32)
    xd[..., 0] = rng.uniform(210, 300, (T, B, L))
    xd[..., 2] = rng.uniform(0, 1e-4, (T, B, L))
    xd[..., 3] = rng.uniform(0, 1e-4, (T, B, L))
    xd[..., NX - 1] = rng.uniform(1e-6, 1e-2, (T, B, L))
    mem0 = np.zeros((B, LC, NH_MEM + 1), np.float32)

    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(xm[0]),
                       jnp.asarray(xs[0]), jnp.asarray(mem0),
                       jnp.asarray(xd[0]))
    fp = dict(params["params"])
    fp["mlp_toa1"] = {
        "kernel": jnp.zeros_like(fp["mlp_toa1"]["kernel"]),
        "bias": jnp.zeros_like(fp["mlp_toa1"]["bias"])}
    params = {"params": fp}

    ref = _ref_model(g)
    _copy_dense(ref.mlp_initial, fp, "mlp_initial")
    _copy_dense(ref.mlp_surface1, fp, "mlp_surface1")
    _copy_dense(ref.mlp_latent, fp, "mlp_latent")
    _copy_dense(ref.mlp_output, fp, "mlp_output")
    _copy_gru(ref.rnn1, fp, "rnn_up")
    _copy_gru(ref.rnn2, fp, "rnn_down")
    _copy_dense(ref.mlp_output_rad, fp, "mlp_output_rad")
    _copy_dense(ref.mlp_surface_output_rad, fp, "mlp_surface_output_rad")
    for n in ["mlp_qv_crm", "mlp_qn_crm", "mlp_qice_crm", "mlp_sed_qn_crm",
              "mlp_massflux", "mlp_eddy_diff", "mlp_evap_prec_crm",
              "mlp_evap_cond_vapor_crm", "mlp_mp_aa_crm",
              "mlp_subgrid_area_frac", "mlp_precip_release", "mlp_t_crm"]:
        _copy_dense(getattr(ref, n), fp, n)
    ref.eval()

    try:
        import importlib
        importlib.import_module("torch._dynamo").config.disable = True
    except Exception:
        pass
    orig_randn = torch.randn
    torch.randn = lambda *a, **k: torch.zeros(
        *a, **{kk: vv for kk, vv in k.items() if kk != "device"})
    try:
        mem_o = jnp.asarray(mem0)
        mem_r = torch.from_numpy(np.swapaxes(mem0, 0, 1).copy())
        for t in range(T):
            out_o, sfc_o, mem_o, _ = ours.apply(
                params, jnp.asarray(xm[t]), jnp.asarray(xs[t]), mem_o,
                jnp.asarray(xd[t]))
            with torch.no_grad():
                out_r, sfc_r, mem_r, _ = ref([
                    torch.from_numpy(xm[t]), torch.from_numpy(xs[t]),
                    mem_r, torch.from_numpy(xd[t])])
            np.testing.assert_allclose(np.asarray(out_o), out_r.numpy(),
                                       rtol=5e-3, atol=5e-4,
                                       err_msg=f"step {t}")
            np.testing.assert_allclose(
                np.asarray(mem_o), np.swapaxes(mem_r.numpy(), 0, 1),
                rtol=5e-3, atol=5e-4, err_msg=f"mem step {t}")
    finally:
        torch.randn = orig_randn


def test_physical_rnn_parity_per_level_yscales():
    """Per-level yscale columns (the reference's yscale_lev[:, c]): parity
    with VARYING columns instead of constants."""
    g = Grid.from_file(GRID_PATH)
    tt = lambda a: tuple(float(x) for x in np.asarray(a))
    rng = np.random.default_rng(11)
    col_t = (YS_T * rng.uniform(0.5, 2.0, L)).astype(np.float32)
    col_qv = (YS_QV * rng.uniform(0.5, 2.0, L)).astype(np.float32)
    col_qn = (YS_QN * rng.uniform(0.5, 2.0, L)).astype(np.float32)

    ours = PhysicalRNNAutoreg(
        nx=NX, nx_sfc=NX_SFC, ny=NY, ny_sfc=NY_SFC, nneur=(NH, NH),
        nh_mem=NH_MEM, nreg=NREG, use_clear_sky_region=True,
        pred_subgrid_temp=True, ice_sedimentation=True, store_precip=True,
        allow_extra_heating=True, add_pres=True,
        hyai=tt(g.hyai), hybi=tt(g.hybi), hyam=tt(g.hyam),
        hybm=tt(g.hybm), sp_mean=0.0, sp_div=1.0,
        yscale_t=tuple(col_t), yscale_qv=tuple(col_qv),
        yscale_qn=tuple(col_qn), yscale_precc=YS_PREC,
        qv_channel=NX - 1)

    xm = rng.normal(0, 1, (B, L, NX)).astype(np.float32)
    xs = rng.normal(0, 1, (B, NX_SFC)).astype(np.float32)
    xs[:, 0] = rng.uniform(9.6e4, 1.03e5, B)
    mem = rng.normal(0, 1, (B, LC, NH_MEM + 1)).astype(np.float32)
    mem[:, :, -1] = np.abs(mem[:, :, -1]) * 1e-3
    xd = rng.normal(0, 1, (B, L, NX)).astype(np.float32)
    xd[..., 0] = rng.uniform(210, 300, (B, L))
    xd[..., 2] = rng.uniform(0, 1e-4, (B, L))
    xd[..., 3] = rng.uniform(0, 1e-4, (B, L))
    xd[..., NX - 1] = rng.uniform(1e-6, 1e-2, (B, L))

    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(xm),
                       jnp.asarray(xs), jnp.asarray(mem), jnp.asarray(xd))
    fp = dict(params["params"])
    fp["mlp_toa1"] = {
        "kernel": jnp.zeros_like(fp["mlp_toa1"]["kernel"]),
        "bias": jnp.zeros_like(fp["mlp_toa1"]["bias"])}
    params = {"params": fp}

    ref = _ref_model(g)
    # overwrite the reference's yscale_lev with the varying columns
    ylev = np.ones((L, NY), np.float32)
    ylev[:, 0] = col_t
    ylev[:, 1] = col_qv
    ylev[:, 2] = col_qn
    ref.yscale_lev.data = torch.from_numpy(ylev)
    _copy_dense(ref.mlp_initial, fp, "mlp_initial")
    _copy_dense(ref.mlp_surface1, fp, "mlp_surface1")
    _copy_dense(ref.mlp_latent, fp, "mlp_latent")
    _copy_dense(ref.mlp_output, fp, "mlp_output")
    _copy_gru(ref.rnn1, fp, "rnn_up")
    _copy_gru(ref.rnn2, fp, "rnn_down")
    _copy_dense(ref.mlp_output_rad, fp, "mlp_output_rad")
    _copy_dense(ref.mlp_surface_output_rad, fp, "mlp_surface_output_rad")
    for n in ["mlp_qv_crm", "mlp_qn_crm", "mlp_qice_crm", "mlp_sed_qn_crm",
              "mlp_massflux", "mlp_eddy_diff", "mlp_evap_prec_crm",
              "mlp_evap_cond_vapor_crm", "mlp_mp_aa_crm",
              "mlp_subgrid_area_frac", "mlp_precip_release", "mlp_t_crm"]:
        _copy_dense(getattr(ref, n), fp, n)
    ref.eval()

    out_o, sfc_o, mem_o, aux_o = ours.apply(
        params, jnp.asarray(xm), jnp.asarray(xs), jnp.asarray(mem),
        jnp.asarray(xd))
    try:
        import importlib
        importlib.import_module("torch._dynamo").config.disable = True
    except Exception:
        pass
    orig_randn = torch.randn
    torch.randn = lambda *a, **k: torch.zeros(
        *a, **{kk: vv for kk, vv in k.items() if kk != "device"})
    try:
        with torch.no_grad():
            out_r, sfc_r, mem_r, pneg_r = ref([
                torch.from_numpy(xm), torch.from_numpy(xs),
                torch.from_numpy(np.swapaxes(mem, 0, 1).copy()),
                torch.from_numpy(xd)])
    finally:
        torch.randn = orig_randn
    np.testing.assert_allclose(np.asarray(out_o), out_r.numpy(),
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(sfc_o), sfc_r.numpy(),
                               rtol=2e-3, atol=2e-4)
