"""Flagship model parity: our RNNAutoreg vs the reference's RNN_autoreg
(rnn/models/models.py) executed in-place with IDENTICAL weights.

The saved .pt wrappers are stripped from the snapshot, so this constructs
the parity oracle live: instantiate the reference torch model (omegaconf
stubbed — only DictConfig attribute access is used), copy our flax
parameters into it layer-by-layer (flax kernels are torch weights
transposed; GRU gate order r,z,n matches), and require allclose forward
outputs on the same inputs. This pins the entire forward contract:
pressure feature, memory concat, sweep directions, hidden initializations,
latent/output heads, and top-12-level pruning.
"""
import sys
import types

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

# stub omegaconf (not installed): models.py only type-hints DictConfig
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
sys.path.insert(0, "/root/reference/rnn/models")

from climsim_tpu.grid import Grid  # noqa: E402
from climsim_tpu.models.rnn import RNNAutoreg  # noqa: E402

GRID_PATH = "/root/reference/grid_info/ClimSim_low-res_grid-info.nc"

NX, NX_SFC, NY, NY_SFC = 15, 24, 6, 8
NH = 32
NH_MEM = 8
L = 60
B = 16


def _coeffs(g):
    z = lambda *s: np.zeros(s, np.float32)
    return {
        "yscale_lev": np.ones((L, NY), np.float32),
        "yscale_sca": np.ones(NY_SFC, np.float32),
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


def _load_ref_models_module():
    """Load /root/reference/rnn/models/models.py under a unique name —
    a bare `import models` is order-dependent across the test session
    (the reference also has a `models` PACKAGE at rnn/models/)."""
    import importlib.util

    if "ref_rnn_models" in sys.modules:
        return sys.modules["ref_rnn_models"]
    spec = importlib.util.spec_from_file_location(
        "ref_rnn_models", "/root/reference/rnn/models/models.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_rnn_models"] = mod
    spec.loader.exec_module(mod)
    return mod


def _ref_model(g):
    RNN_autoreg = _load_ref_models_module().RNN_autoreg

    cfg = _DictConfig(
        ny=NY, nlev=L, nx=NX, nx_sfc=NX_SFC, ny_sfc=NY_SFC,
        nneur=[NH, NH], nh_mem=NH_MEM, use_initial_mlp=True,
        add_pres=True, output_prune=True, use_lstm=False,
        add_stochastic_layer=False, ensemble_size=1, mp_mode=0,
        separate_radiation=False, concat=False, autoregressive=True,
    )
    return RNN_autoreg(cfg, _coeffs(g), torch.device("cpu"))


def _copy_dense(tmod, fparams, name):
    """flax Dense kernel [in,out] -> torch Linear weight [out,in]."""
    k = np.asarray(fparams[name]["kernel"])
    b = np.asarray(fparams[name]["bias"])
    tmod.weight.data = torch.from_numpy(k.T.copy())
    tmod.bias.data = torch.from_numpy(b.copy())


def _copy_gru(tgru, fparams, layer_name):
    """flax RNNLayer {input_proj, cell/hh} -> torch nn.GRU l0 params.
    Gate order (r,z,n) matches."""
    lp = fparams[layer_name]
    wih = np.asarray(lp["input_proj"]["kernel"]).T    # [3H, in]
    bih = np.asarray(lp["input_proj"]["bias"])
    whh = np.asarray(lp["cell"]["hh"]["kernel"]).T    # [3H, H]
    bhh = np.asarray(lp["cell"]["hh"]["bias"])
    tgru.weight_ih_l0.data = torch.from_numpy(wih.copy())
    tgru.bias_ih_l0.data = torch.from_numpy(bih.copy())
    tgru.weight_hh_l0.data = torch.from_numpy(whh.copy())
    tgru.bias_hh_l0.data = torch.from_numpy(bhh.copy())


def test_rnn_autoreg_forward_parity_with_reference():
    g = Grid.from_file(GRID_PATH)
    tt = lambda a: tuple(float(x) for x in np.asarray(a))
    ours = RNNAutoreg(nx=NX, nx_sfc=NX_SFC, ny=NY, ny_sfc=NY_SFC,
                      nneur=(NH, NH), nh_mem=NH_MEM, cell="gru",
                      use_initial_mlp=True, add_pres=True,
                      output_prune=True, hyam=tt(g.hyam), hybm=tt(g.hybm),
                      sp_mean=0.0, sp_div=1.0)
    rng = np.random.default_rng(0)
    xm = rng.normal(0, 1, (B, L, NX)).astype(np.float32)
    xs = rng.normal(0, 1, (B, NX_SFC)).astype(np.float32)
    xs[:, 0] = rng.uniform(9.6e4, 1.03e5, B)   # raw-ish ps channel
    mem = rng.normal(0, 1, (B, L, NH_MEM)).astype(np.float32)

    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(xm),
                       jnp.asarray(xs), jnp.asarray(mem))
    fp = params["params"]

    ref = _ref_model(g)
    _copy_dense(ref.mlp_initial, fp, "mlp_initial")
    _copy_dense(ref.mlp_surface1, fp, "mlp_surface1")
    _copy_dense(ref.mlp_toa1, fp, "mlp_toa1")
    _copy_dense(ref.mlp_latent, fp, "mlp_latent")
    _copy_dense(ref.mlp_output, fp, "mlp_output")
    _copy_dense(ref.mlp_surface_output, fp, "mlp_surface_output")
    _copy_gru(ref.rnn1, fp, "rnn_up")
    _copy_gru(ref.rnn2, fp, "rnn_down")
    ref.eval()

    out_o, sfc_o, mem_o = ours.apply(params, jnp.asarray(xm),
                                     jnp.asarray(xs), jnp.asarray(mem))

    with torch.no_grad():
        # reference is level-first internally; it transposes inputs_main
        # itself but expects rnn_mem level-first [L, B, nh]
        out_r, sfc_r, mem_r = ref([
            torch.from_numpy(xm), torch.from_numpy(xs),
            torch.from_numpy(np.swapaxes(mem, 0, 1).copy())])

    np.testing.assert_allclose(np.asarray(out_o), out_r.numpy(),
                               rtol=3e-4, atol=3e-5)
    np.testing.assert_allclose(np.asarray(sfc_o), sfc_r.numpy(),
                               rtol=3e-4, atol=3e-5)
    np.testing.assert_allclose(np.asarray(mem_o),
                               np.swapaxes(mem_r.numpy(), 0, 1),
                               rtol=3e-4, atol=3e-5)


def test_rnn_autoreg_rollout_parity_with_reference():
    """3 autoregressive steps with memory threading: our scan-based step
    iterated == the reference model iterated (the wrapper validation loop,
    save_wrapper_mem_prevtend_ftorch.py:471-510)."""
    g = Grid.from_file(GRID_PATH)
    tt = lambda a: tuple(float(x) for x in np.asarray(a))
    ours = RNNAutoreg(nx=NX, nx_sfc=NX_SFC, ny=NY, ny_sfc=NY_SFC,
                      nneur=(NH, NH), nh_mem=NH_MEM, cell="gru",
                      hyam=tt(g.hyam), hybm=tt(g.hybm),
                      sp_mean=0.0, sp_div=1.0)
    rng = np.random.default_rng(1)
    T = 3
    xm = rng.normal(0, 1, (T, B, L, NX)).astype(np.float32)
    xs = rng.normal(0, 1, (T, B, NX_SFC)).astype(np.float32)
    xs[..., 0] = rng.uniform(9.6e4, 1.03e5, (T, B))
    mem0 = np.zeros((B, L, NH_MEM), np.float32)

    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(xm[0]),
                       jnp.asarray(xs[0]), jnp.asarray(mem0))
    fp = params["params"]
    ref = _ref_model(g)
    for nm, mod in (("mlp_initial", ref.mlp_initial),
                    ("mlp_surface1", ref.mlp_surface1),
                    ("mlp_toa1", ref.mlp_toa1),
                    ("mlp_latent", ref.mlp_latent),
                    ("mlp_output", ref.mlp_output),
                    ("mlp_surface_output", ref.mlp_surface_output)):
        _copy_dense(mod, fp, nm)
    _copy_gru(ref.rnn1, fp, "rnn_up")
    _copy_gru(ref.rnn2, fp, "rnn_down")
    ref.eval()

    mem_o = jnp.asarray(mem0)
    mem_r = torch.from_numpy(np.swapaxes(mem0, 0, 1).copy())
    for t in range(T):
        out_o, sfc_o, mem_o = ours.apply(params, jnp.asarray(xm[t]),
                                         jnp.asarray(xs[t]), mem_o)
        with torch.no_grad():
            out_r, sfc_r, mem_r = ref([torch.from_numpy(xm[t]),
                                       torch.from_numpy(xs[t]), mem_r])
        np.testing.assert_allclose(np.asarray(out_o), out_r.numpy(),
                                   rtol=1e-3, atol=1e-4,
                                   err_msg=f"step {t}")
    np.testing.assert_allclose(np.asarray(mem_o),
                               np.swapaxes(mem_r.numpy(), 0, 1),
                               rtol=1e-3, atol=1e-4)


def test_postprocess_mp_minus2_parity_with_reference():
    """mp_mode -2 (total-water + cloud-fraction decomposition) parity vs
    the reference Base_RNN_autoreg.postprocessing (models.py:273-339).
    Predicted liquid fractions are placed INSIDE the +-0.2 clamp band so
    the reference's leftover clamp-discarding line (:320, documented in
    our docstring) is value-neutral."""
    from climsim_tpu.models.rnn import postprocess_mp, temperature_scaling

    g = Grid.from_file(GRID_PATH)
    ref_models = _load_ref_models_module()
    NY2 = 6
    cfg = _DictConfig(
        ny=NY2, nlev=L, nx=NX, nx_sfc=NX_SFC, ny_sfc=NY_SFC,
        nneur=[NH, NH], nh_mem=NH_MEM, use_initial_mlp=True,
        add_pres=True, output_prune=True, use_lstm=False,
        add_stochastic_layer=False, ensemble_size=1, mp_mode=-2,
        separate_radiation=False, concat=False, autoregressive=True,
    )
    co = _coeffs(g)
    co["yscale_lev"] = np.ones((L, NY2), np.float32) * 2.0
    ref = ref_models.RNN_autoreg(cfg, co, torch.device("cpu"))

    rng = np.random.default_rng(4)
    xd = rng.normal(0, 1, (B, L, NX)).astype(np.float32)
    xd[..., 0] = rng.uniform(210, 300, (B, L))     # T
    xd[..., 2] = rng.uniform(0, 1e-4, (B, L))      # qliq
    xd[..., 3] = rng.uniform(0, 1e-4, (B, L))      # qice
    xd[..., -1] = rng.uniform(1e-6, 1e-2, (B, L))  # qv (last channel)

    out = rng.normal(0, 1e-3, (B, L, NY2)).astype(np.float32)
    # place the predicted liq fraction inside the clamp band around the
    # T-diagnosed ramp of T_new
    ys = 2.0
    T_new = xd[..., 0] + (out[..., 0] / ys) * 1200.0
    diag = np.clip((T_new - 253.16) * 0.05, 0.0, 1.0)
    out[..., 3] = np.clip(diag + rng.uniform(-0.1, 0.1, (B, L)),
                          0.0, 1.0) * ys
    out_sfc = rng.normal(0, 1, (B, NY_SFC)).astype(np.float32)

    with torch.no_grad():
        o_r, os_r = ref.postprocessing(torch.from_numpy(out.copy()),
                                       torch.from_numpy(out_sfc.copy()),
                                       torch.from_numpy(xd.copy()))
    o_o, os_o = postprocess_mp(
        jnp.asarray(out), jnp.asarray(out_sfc), jnp.asarray(xd),
        jnp.full((1, L, NY2), 2.0), jnp.ones(NY_SFC), mp_mode=-2)
    np.testing.assert_allclose(np.asarray(o_o), o_r.numpy(),
                               rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(np.asarray(os_o), os_r.numpy(),
                               rtol=1e-5, atol=1e-7)
