"""HSR and cVAE baseline parity vs the reference torch models executed
in-place with identical copied weights (baseline_models/HSR/training/
hsr.py:14-81, baseline_models/cVAE/training/cvae.py:13-135). Pins the
Linear->LayerNorm->ReLU tower structure, the HSR (mean, logprec) heads,
and the cVAE encoder-mu / decoder (mean, exp-std) deterministic paths."""
import importlib.util
import sys
import types

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")


def _load(path, name):
    # stub `tools` (progress bar helper, unused in forward)
    t = types.ModuleType("tools")
    t.progress = lambda *a, **k: None
    sys.modules.setdefault("tools", t)
    spec = importlib.util.spec_from_file_location(name, path)
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def _copy_linear(lin, kernel, bias):
    lin.weight.data = torch.from_numpy(np.asarray(kernel).T.copy())
    lin.bias.data = torch.from_numpy(np.asarray(bias).copy())


def _copy_tower(ref_mlp, p, layers):
    for i in range(layers):
        _copy_linear(ref_mlp.linears[i][0], p[f"hidden_{i}"]["kernel"],
                     p[f"hidden_{i}"]["bias"])
        ref_mlp.linears[i][1].weight.data = torch.from_numpy(
            np.asarray(p[f"ln_{i}"]["scale"]).copy())
        ref_mlp.linears[i][1].bias.data = torch.from_numpy(
            np.asarray(p[f"ln_{i}"]["bias"]).copy())
    _copy_linear(ref_mlp.final_linear, p["out"]["kernel"], p["out"]["bias"])


def test_hsr_forward_parity():
    from climsim_tpu.models.hsr import HSR

    ref_mod = _load("/root/reference/baseline_models/HSR/training/hsr.py",
                    "ref_hsr")
    nin, nout, hid, layers = 124, 128, 64, 2
    ours = HSR(out_dim=nout, hidden=hid, layers=layers)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((8, nin)).astype(np.float32)
    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    mean_o, logprec_o = ours.apply({"params": params}, jnp.asarray(x))

    ref = ref_mod.HeteroskedasticRegression(nin, nout, hid, layers)
    ref.eval()
    _copy_tower(ref.mean, params["mean"], layers)
    _copy_tower(ref.logprec, params["logprec"], layers)
    with torch.no_grad():
        mean_r, logprec_r = ref(torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(mean_o), mean_r.numpy(),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(logprec_o), logprec_r.numpy(),
                               rtol=1e-5, atol=1e-5)


def _copy_stack(ref_lins, p, layers, prefix="h"):
    for i in range(layers):
        _copy_linear(ref_lins[i][0], p[f"{prefix}{i}"]["kernel"],
                     p[f"{prefix}{i}"]["bias"])
        ref_lins[i][1].weight.data = torch.from_numpy(
            np.asarray(p[f"ln{i}"]["scale"]).copy())
        ref_lins[i][1].bias.data = torch.from_numpy(
            np.asarray(p[f"ln{i}"]["bias"]).copy())


def test_cvae_deterministic_paths_parity():
    from climsim_tpu.models.cvae import CVAE

    ref_mod = _load("/root/reference/baseline_models/cVAE/training/cvae.py",
                    "ref_cvae")
    nx, ny, nz, hid, layers = 124, 128, 5, 64, 2
    ours = CVAE(out_dim=ny, latent_dim=nz, hidden=hid, layers=layers)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((8, nx)).astype(np.float32)
    y = rng.standard_normal((8, ny)).astype(np.float32)
    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(y),
                       jnp.asarray(x), jax.random.PRNGKey(1))["params"]

    ref = ref_mod.ConditionalVAE(data_dims=nx, label_dims=ny,
                                 latent_dims=nz, hidden_dims=hid,
                                 layers=layers)
    ref.eval()
    _copy_stack(ref.encoder.linears, params["enc"], layers)
    _copy_linear(ref.encoder.linear_mean, params["enc_mu"]["kernel"],
                 params["enc_mu"]["bias"])
    _copy_linear(ref.encoder.linear_logstd, params["enc_logstd"]["kernel"],
                 params["enc_logstd"]["bias"])
    _copy_stack(ref.decoder.linears, params["dec"], layers)
    _copy_linear(ref.decoder.final_linear1, params["dec_mean"]["kernel"],
                 params["dec_mean"]["bias"])
    _copy_linear(ref.decoder.final_log_std1, params["dec_logstd"]["kernel"],
                 params["dec_logstd"]["bias"])

    # encoder latent mean (return_latent path)
    mu_o, logstd_o = ours.apply({"params": params}, jnp.asarray(y),
                                jnp.asarray(x), method=CVAE.encode)
    with torch.no_grad():
        mu_r = ref.encoder(torch.from_numpy(y), torch.from_numpy(x),
                           return_latent=True)
    np.testing.assert_allclose(np.asarray(mu_o), mu_r.numpy(),
                               rtol=1e-5, atol=1e-5)

    # decoder (mean, exp-std) at a fixed z
    z = rng.standard_normal((8, nz)).astype(np.float32)
    m_o, s_o = ours.apply({"params": params}, jnp.asarray(z),
                          jnp.asarray(x), method=CVAE.decode)
    with torch.no_grad():
        m_r, s_r = ref.decoder(torch.from_numpy(z), torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(m_o), m_r.numpy(),
                               rtol=1e-4, atol=1e-4)
    # exp amplifies f32 accumulation differences
    np.testing.assert_allclose(np.asarray(s_o), s_r.numpy(),
                               rtol=1e-4, atol=1e-4)

    # KL matches the reference formula at these (mu, sigma)
    sigma = np.exp(np.asarray(logstd_o))
    kl_exp = np.mean(sigma ** 2 + np.asarray(mu_o) ** 2
                     - np.asarray(logstd_o) - 0.5)
    _, _, kl_o = ours.apply({"params": params}, jnp.asarray(y),
                            jnp.asarray(x), jax.random.PRNGKey(3))
    np.testing.assert_allclose(float(kl_o), kl_exp, rtol=1e-5)
