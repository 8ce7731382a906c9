"""Online-wrapper contract parity: our OnlineWrapper preprocessing and
mp-constraint postprocessing vs the reference NewModel_constraint
(rnn/save_wrapper_mem_prevtend_ftorch.py:159-330) executed in place. The
wrapper is the binding E3SM-facing interface (un-normalized in/out,
SURVEY.md §3.4) — this pins the snowhice fix, cloud transforms, norm order,
rh clip, NaN scrub, and the T-ramp qn -> (dqliq, dqice) split."""
import ast
import types

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")

REF = "/root/reference/rnn/save_wrapper_mem_prevtend_ftorch.py"


def _load_ref_class():
    """exec only the NewModel_constraint class (the module body jit-loads
    a stripped .pt at import time)."""
    src = open(REF).read()
    tree = ast.parse(src)
    cls = next(n for n in tree.body if isinstance(n, ast.ClassDef)
               and n.name == "NewModel_constraint")
    mod = ast.Module(body=[cls], type_ignores=[])
    ns = {"torch": torch, "nn": torch.nn,
          "F": torch.nn.functional,
          "Final": __import__("typing").Final,
          "Tensor": torch.Tensor,
          "List": __import__("typing").List,
          "Optional": __import__("typing").Optional,
          # module-level flags the class body branches on
          "use_ar_noise": False, "include_prev_outputs": False,
          "nmem": 16, "nens": 1}
    exec(compile(mod, REF, "exec"), ns)
    return ns["NewModel_constraint"]


class _StubModel(torch.nn.Module):
    def __init__(self, nx, ns, ny, nys, L=60):
        super().__init__()
        rng = np.random.default_rng(0)
        self.xmean_lev = torch.from_numpy(
            rng.normal(0, 1, (L, nx)).astype(np.float32))
        self.xdiv_lev = torch.from_numpy(
            rng.uniform(0.5, 2, (L, nx)).astype(np.float32))
        self.xmean_sca = torch.from_numpy(
            rng.normal(0, 1, ns).astype(np.float32))
        self.xdiv_sca = torch.from_numpy(
            rng.uniform(0.5, 2, ns).astype(np.float32))
        self.yscale_lev = torch.from_numpy(
            rng.uniform(0.5, 2, (L, ny)).astype(np.float32))
        self.yscale_sca = torch.from_numpy(
            rng.uniform(0.5, 2, nys).astype(np.float32))


def _make_pair(v5_input, predict_liq_ratio=False, qinput_prune=True):
    from climsim_tpu.export.wrapper import OnlineWrapper, WrapperConfig

    nx, ns, ny, nys, L = 7, 18, 6, 8, 60
    stub = _StubModel(nx, ns, ny, nys, L)
    rng = np.random.default_rng(1)
    lbd_qc = rng.uniform(1e3, 1e5, L).astype(np.float32)
    lbd_qi = rng.uniform(1e3, 1e5, L).astype(np.float32)
    lbd_qn = rng.uniform(1e3, 1e5, L).astype(np.float32)

    cls = _load_ref_class()
    ref = cls(stub, lbd_qc, lbd_qi, lbd_qn, qinput_prune=qinput_prune,
              rh_prune=True, snowhice_fix=True, v5_input=v5_input,
              mp_constraint=True, predict_liq_ratio=predict_liq_ratio,
              perturb=False, return_det=False, device="cpu")

    norm = types.SimpleNamespace(
        mean_lev=jnp.asarray(stub.xmean_lev.numpy()),
        div_lev=jnp.asarray(stub.xdiv_lev.numpy()),
        mean_sfc=jnp.asarray(stub.xmean_sca.numpy()),
        div_sfc=jnp.asarray(stub.xdiv_sca.numpy()),
        scale_lev=jnp.asarray(stub.yscale_lev.numpy()),
        scale_sfc=jnp.asarray(stub.yscale_sca.numpy()))
    ours = OnlineWrapper(
        model=None, params=None, norm=norm, lbd_qc=lbd_qc, lbd_qi=lbd_qi,
        lbd_qn=lbd_qn,
        cfg=WrapperConfig(v5_input=v5_input, qinput_prune=qinput_prune,
                          rh_prune=True, snowhice_fix=True,
                          mp_mode=-1 if predict_liq_ratio else 1))
    return ref, ours, (nx, ns, ny, nys, L)


def _raw_inputs(nx, ns, L, B=6, seed=2):
    rng = np.random.default_rng(seed)
    x = rng.normal(0, 1, (B, L, nx)).astype(np.float32)
    x[..., 0] = rng.uniform(200, 300, (B, L))   # T
    x[..., 1] = rng.uniform(0, 1.3, (B, L))     # rh
    x[..., 2] = rng.uniform(0, 1e-4, (B, L))    # qc
    x[..., 3] = rng.uniform(0, 1e-4, (B, L))    # qi
    x[1, 5, 4] = np.nan                         # scrub check
    x[2, 6, 5] = np.inf
    s = rng.normal(0, 1, (B, ns)).astype(np.float32)
    s[0, 15] = 2e10                             # SNOWHICE sentinel
    return x, s


@pytest.mark.parametrize("v5", [False, True])
def test_wrapper_preprocessing_parity(v5):
    ref, ours, (nx, ns, ny, nys, L) = _make_pair(v5)
    x, s = _raw_inputs(nx, ns, L)
    xm_o, xs_o = ours.preprocess(jnp.asarray(x), jnp.asarray(s))
    with torch.no_grad():
        xm_r, xs_r = ref.preprocessing(torch.from_numpy(x.copy()),
                                       torch.from_numpy(s.copy()))
    np.testing.assert_allclose(np.asarray(xm_o), xm_r.numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(xs_o), xs_r.numpy(),
                               rtol=1e-5, atol=1e-6)
    assert np.isfinite(np.asarray(xm_o)).all()


@pytest.mark.parametrize("predict_liq_ratio", [False, True])
def test_wrapper_pp_mp_parity(predict_liq_ratio):
    from climsim_tpu.models.rnn import postprocess_mp

    ref, ours, (nx, ns, ny, nys, L) = _make_pair(False, predict_liq_ratio)
    rng = np.random.default_rng(3)
    B = 6
    out = rng.normal(0, 1, (B, L, ny)).astype(np.float32)
    out_sfc = rng.normal(0, 1, (B, nys)).astype(np.float32)
    x, s = _raw_inputs(nx, ns, L, B=B, seed=4)
    x = np.nan_to_num(x, posinf=0.0)
    with torch.no_grad():
        o_r, os_r = ref.pp_mp(torch.from_numpy(out.copy()),
                              torch.from_numpy(out_sfc.copy()),
                              torch.from_numpy(x.copy()))
    yl = jnp.asarray(np.asarray(ours.norm.scale_lev))[None]
    ys = jnp.asarray(np.asarray(ours.norm.scale_sfc))
    o_o, os_o = postprocess_mp(jnp.asarray(out), jnp.asarray(out_sfc),
                               jnp.asarray(x), yl, ys,
                               mp_mode=-1 if predict_liq_ratio else 1)
    np.testing.assert_allclose(np.asarray(o_o), o_r.numpy(),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(os_o), os_r.numpy(),
                               rtol=1e-5, atol=1e-6)
