"""Stochastic GRU (v5) parity: our StochasticGRUCell vs the reference
MyStochasticGRULayer5 (rnn/models_torch_kernels.py:565-622) with identical
copied weights. The reference samples eps internally, so parity is checked
on the deterministic path z = mean (eps scaled to zero on our side,
torch.randn patched to zeros on the reference side)."""
import importlib.util
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")


def _load_ref():
    spec = importlib.util.spec_from_file_location(
        "ref_torch_kernels", "/root/reference/rnn/models_torch_kernels.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_stochastic_gru_v5_parity_deterministic_path():
    from climsim_tpu.models.cells import RNNLayer

    ref_mod = _load_ref()
    nx, H, L, B = 10, 16, 12, 4
    rng = np.random.default_rng(0)
    x = rng.standard_normal((B, L, nx)).astype(np.float32)
    h0 = rng.standard_normal((B, H)).astype(np.float32)

    layer = RNNLayer(hidden=H, kind="sgru", noise=True)
    eps = jnp.zeros((L, B, H), jnp.float32)       # z = mean exactly
    params = layer.init(jax.random.PRNGKey(0), jnp.asarray(x),
                        jnp.asarray(h0), eps)["params"]
    # the reference's hoisted input projection has no bias
    # (use_bias=False default); zero ours to compare
    params = jax.tree_util.tree_map(lambda a: a, params)
    params["input_proj"]["bias"] = jnp.zeros_like(
        params["input_proj"]["bias"])
    ys, hT = layer.apply({"params": params}, jnp.asarray(x),
                         jnp.asarray(h0), eps)

    ref = ref_mod.MyStochasticGRULayer5(nx, H, use_bias=False)
    ref.weight_ih.data = torch.from_numpy(
        np.asarray(params["input_proj"]["kernel"]).copy())
    ref.weight_zh.data = torch.from_numpy(
        np.asarray(params["cell"]["zh"]["kernel"]).copy())
    ref.weight_encoder.data = torch.from_numpy(
        np.asarray(params["cell"]["encoder"]["kernel"]).copy())

    # deterministic reference: patch randn to zeros and run eagerly
    try:
        import importlib
        importlib.import_module("torch._dynamo").config.disable = True
    except Exception:
        pass
    orig_randn = torch.randn
    torch.randn = lambda *a, **k: torch.zeros(*a, **{kk: vv for kk, vv
                                                     in k.items()
                                                     if kk != "device"})
    try:
        with torch.no_grad():
            # reference layout: [seq, batch, nx]
            y_ref = ref.forward(torch.from_numpy(
                np.transpose(x, (1, 0, 2)).copy()), torch.from_numpy(h0))
    finally:
        torch.randn = orig_randn

    np.testing.assert_allclose(np.asarray(ys),
                               np.transpose(y_ref.numpy(), (1, 0, 2)),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hT), y_ref.numpy()[-1],
                               rtol=1e-5, atol=1e-5)


def test_stochastic_gru_noise_perturbs_candidate():
    from climsim_tpu.models.cells import RNNLayer
    nx, H, L, B = 10, 16, 12, 4
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((B, L, nx)), jnp.float32)
    h0 = jnp.zeros((B, H), jnp.float32)
    layer = RNNLayer(hidden=H, kind="sgru", noise=True)
    eps0 = jnp.zeros((L, B, H), jnp.float32)
    eps1 = jax.random.normal(jax.random.PRNGKey(2), (L, B, H))
    params = layer.init(jax.random.PRNGKey(0), x, h0, eps0)
    y0, _ = layer.apply(params, x, h0, eps0)
    y1, _ = layer.apply(params, x, h0, eps1)
    assert not np.allclose(np.asarray(y0), np.asarray(y1))


def test_stochastic_lstm_v4_parity_deterministic_path():
    """Our StochasticLSTMCell vs MyStochasticLSTMLayer4
    (models_torch_kernels.py:1204-1261) with copied weights, eps -> 0."""
    from climsim_tpu.models.cells import RNNLayer

    ref_mod = _load_ref()
    nx, H, L, B = 10, 16, 12, 4
    rng = np.random.default_rng(3)
    x = rng.standard_normal((B, L, nx)).astype(np.float32)
    h0 = rng.standard_normal((B, H)).astype(np.float32)
    c0 = rng.standard_normal((B, H)).astype(np.float32)

    layer = RNNLayer(hidden=H, kind="slstm", noise=True)
    eps = jnp.zeros((L, B, H), jnp.float32)
    carry0 = (jnp.asarray(h0), jnp.asarray(c0))
    params = layer.init(jax.random.PRNGKey(0), jnp.asarray(x), carry0,
                        eps)["params"]
    params["input_proj"]["bias"] = jnp.zeros_like(
        params["input_proj"]["bias"])
    ys, (hT, cT) = layer.apply({"params": params}, jnp.asarray(x), carry0,
                               eps)

    ref = ref_mod.MyStochasticLSTMLayer4(nx, H, use_bias=False)
    # reference weight_encoder [nx+H, 5H]: rows 0:nx = x kernel,
    # rows nx: = h kernel
    w = np.concatenate([np.asarray(params["input_proj"]["kernel"]),
                        np.asarray(params["cell"]["hh"]["kernel"])], axis=0)
    ref.weight_encoder.data = torch.from_numpy(w.copy())

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
            y_ref, (h_ref, c_ref) = ref.forward(
                torch.from_numpy(np.transpose(x, (1, 0, 2)).copy()),
                (torch.from_numpy(h0), torch.from_numpy(c0)))
    finally:
        torch.randn = orig_randn

    np.testing.assert_allclose(np.asarray(ys),
                               np.transpose(y_ref.numpy(), (1, 0, 2)),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hT), h_ref.numpy(), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(cT), c_ref.numpy(), rtol=1e-5,
                               atol=1e-5)


def test_sru_parity_with_reference():
    """Our SRUCell vs the reference SRU (models_torch_kernels.py:25-63)
    with copied weights; nx == hidden so the raw-x highway is active."""
    from climsim_tpu.models.cells import RNNLayer

    ref_mod = _load_ref()
    nx = H = 16
    L, B = 12, 4
    rng = np.random.default_rng(4)
    x = rng.standard_normal((B, L, nx)).astype(np.float32)
    c0 = rng.standard_normal((B, H)).astype(np.float32)

    layer = RNNLayer(hidden=H, kind="sru")
    params = layer.init(jax.random.PRNGKey(0), jnp.asarray(x),
                        jnp.asarray(c0))["params"]
    # reference linear_transform (x_tilde) has no bias; the gate does
    b = np.asarray(params["input_proj"]["bias"]).copy()
    b[:H] = 0.0
    params["input_proj"]["bias"] = jnp.asarray(b)
    ys, cT = layer.apply({"params": params}, jnp.asarray(x),
                         jnp.asarray(c0))

    ref = ref_mod.SRU(nx, H)
    k = np.asarray(params["input_proj"]["kernel"])
    ref.linear_transform.weight.data = torch.from_numpy(k[:, :H].T.copy())
    ref.gate.weight.data = torch.from_numpy(k[:, H:].T.copy())
    ref.gate.bias.data = torch.from_numpy(b[H:].copy())
    p = params["cell"]
    ref.gate_ln.weight.data = torch.from_numpy(
        np.asarray(p["gate_ln"]["scale"]).copy())
    ref.gate_ln.bias.data = torch.from_numpy(
        np.asarray(p["gate_ln"]["bias"]).copy())
    ref.act_ln.weight.data = torch.from_numpy(
        np.asarray(p["act_ln"]["scale"]).copy())
    ref.act_ln.bias.data = torch.from_numpy(
        np.asarray(p["act_ln"]["bias"]).copy())

    try:
        import importlib
        importlib.import_module("torch._dynamo").config.disable = True
    except Exception:
        pass
    with torch.no_grad():
        # reference layout is batch-first [B, T, nx]
        y_ref, c_ref = ref.forward(torch.from_numpy(x.copy()),
                                   torch.from_numpy(c0))
    np.testing.assert_allclose(np.asarray(ys), y_ref.numpy(),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cT), c_ref.numpy(),
                               rtol=1e-5, atol=1e-5)


def test_stochastic_layernorm_lstm_parity():
    """Our StochasticLayerNormLSTMCell vs StochasticLayerNormLSTMLayer
    (models_torch_kernels.py:698-785) with copied weights, eps -> ones on
    both sides (zero noise would zero the noise-conditioned gains)."""
    from climsim_tpu.models.cells import RNNLayer

    ref_mod = _load_ref()
    nx, H, E, L, B = 10, 16, 8, 6, 4
    rng = np.random.default_rng(5)
    x = rng.standard_normal((B, L, nx)).astype(np.float32)
    h0 = rng.standard_normal((B, H)).astype(np.float32)
    c0 = rng.standard_normal((B, H)).astype(np.float32)

    layer = RNNLayer(hidden=H, kind="sln_lstm", noise=True, eps_size=E)
    eps = jnp.ones((L, B, E), jnp.float32)
    carry0 = (jnp.asarray(h0), jnp.asarray(c0))
    params = layer.init(jax.random.PRNGKey(0), jnp.asarray(x), carry0,
                        eps)["params"]
    ys, (hT, cT) = layer.apply({"params": params}, jnp.asarray(x),
                               carry0, eps)

    ref = ref_mod.StochasticLayerNormLSTMLayer(nx, H, E)
    ref.weight_ih.data = torch.from_numpy(
        np.asarray(params["input_proj"]["kernel"]).copy())
    ref.bias_ih.data = torch.from_numpy(
        np.asarray(params["input_proj"]["bias"]).copy())
    p = params["cell"]
    ref.weight_hh.data = torch.from_numpy(
        np.asarray(p["hh"]["kernel"]).copy())
    ref.bias_hh.data = torch.from_numpy(np.asarray(p["hh"]["bias"]).copy())
    for ln, name in [(ref.ln_ih, "ln_ih"), (ref.ln_hh, "ln_hh"),
                     (ref.ln_ho, "ln_ho")]:
        ln.gain.data = torch.from_numpy(
            np.asarray(p[f"{name}_gain"]).copy())
        ln.bias.data = torch.from_numpy(
            np.asarray(p[f"{name}_bias"]).copy())

    try:
        import importlib
        importlib.import_module("torch._dynamo").config.disable = True
    except Exception:
        pass
    orig_randn = torch.randn
    torch.randn = lambda *a, **k: torch.ones(
        *a, **{kk: vv for kk, vv in k.items() if kk != "device"})
    try:
        with torch.no_grad():
            y_ref, (h_ref, c_ref) = ref.forward(
                torch.from_numpy(np.transpose(x, (1, 0, 2)).copy()),
                (torch.from_numpy(h0), torch.from_numpy(c0)))
    finally:
        torch.randn = orig_randn

    np.testing.assert_allclose(np.asarray(ys),
                               np.transpose(y_ref.numpy(), (1, 0, 2)),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hT), h_ref.numpy(), rtol=1e-4,
                               atol=1e-5)


def test_glu_block_parity():
    """Our GLU(block=True) vs the reference S4-style GLU module
    (models_torch_kernels.py:1329-1355) with copied weights."""
    from climsim_tpu.models.cells import GLU

    ref_mod = _load_ref()
    B, L, N = 4, 6, 12
    rng = np.random.default_rng(6)
    x = rng.standard_normal((B, L, N)).astype(np.float32)
    ours = GLU(features=N, block=True)
    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    y = ours.apply({"params": params}, jnp.asarray(x))

    ref = ref_mod.GLU(L, N, layernorm=True, dropout=0)
    ref.eval()
    # joint (nseq, nneur) LayerNorm: scale/bias are [L, N]
    ref.normalization.weight.data = torch.from_numpy(
        np.asarray(params["norm"]["scale"]).copy())
    ref.normalization.bias.data = torch.from_numpy(
        np.asarray(params["norm"]["bias"]).copy())
    lin = ref.output_linear[0]
    lin.weight.data = torch.from_numpy(
        np.asarray(params["expand"]["kernel"]).T.copy())
    lin.bias.data = torch.from_numpy(
        np.asarray(params["expand"]["bias"]).copy())
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-5, atol=1e-6)


def test_qrnn_fo_parity_with_reference():
    """Our QRNNLayer vs the reference QRNNLayer (mode='fo',
    models_torch_kernels.py:1358-1425) with copied conv weights: sigmoid
    z, fo-pooling via the reference's log-space cumsum, causal padding."""
    from climsim_tpu.models.cells import QRNNLayer

    ref_mod = _load_ref()
    nx, H, L, B, K_ = 10, 16, 12, 4, 2
    rng = np.random.default_rng(8)
    x = rng.standard_normal((B, L, nx)).astype(np.float32)

    ours = QRNNLayer(H, kernel=K_, causal=True)
    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    h_o, c_o = ours.apply({"params": params}, jnp.asarray(x))

    ref = ref_mod.QRNNLayer(nx, H, K_, mode="fo")
    ref.eval()
    k = np.asarray(params["conv"]["kernel"])       # [K, nx, 3H]
    b = np.asarray(params["conv"]["bias"])         # [3H]
    w = np.transpose(k, (2, 1, 0))                 # [3H, nx, K]
    ref.z_conv.weight.data = torch.from_numpy(w[:H].copy())
    ref.z_conv.bias.data = torch.from_numpy(b[:H].copy())
    ref.f_conv.weight.data = torch.from_numpy(w[H:2 * H].copy())
    ref.f_conv.bias.data = torch.from_numpy(b[H:2 * H].copy())
    ref.o_conv.weight.data = torch.from_numpy(w[2 * H:].copy())
    ref.o_conv.bias.data = torch.from_numpy(b[2 * H:].copy())

    with torch.no_grad():
        h_r = ref.forward(torch.from_numpy(x.copy()),
                          torch.zeros(B, H))
    np.testing.assert_allclose(np.asarray(h_o), h_r.numpy(),
                               rtol=1e-4, atol=1e-5)
