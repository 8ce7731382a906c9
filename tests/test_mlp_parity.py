"""MLP baseline parity: our flax MLP vs the reference MLP_v2rh torch model
(online_testing/baseline_models/MLP_v2rh/training/mlp.py:27-67) with
identical copied weights — pins the ReLU stack, the linear tendency head,
the ReLU'd trailing-8 scalars, and stratosphere output pruning."""
import importlib.util
import sys
import types

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")


def _load_ref_mlp():
    if "modulus" not in sys.modules:
        mod = types.ModuleType("modulus")

        class _Module(torch.nn.Module):
            def __init__(self, meta=None):
                super().__init__()

        mod.Module = _Module
        mod.ModelMetaData = object
        sys.modules["modulus"] = mod
    spec = importlib.util.spec_from_file_location(
        "ref_mlp",
        "/root/reference/online_testing/baseline_models/MLP_v2rh/training/"
        "mlp.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_mlp_v2rh_forward_parity():
    from climsim_tpu.models.mlp import MLP

    ref_mod = _load_ref_mlp()
    nin, nout, hidden, layers = 557, 368, (64, 48, 32), 3
    ours = MLP(features=hidden, out_dim=nout, n_scalar_head=8,
               prune_mask=tuple(
                   np.where((np.arange(nout)[:, None] >=
                             np.array([60, 120, 180, 240])) &
                            (np.arange(nout)[:, None] <
                             np.array([60, 120, 180, 240]) + 15),
                            0.0, 1.0).min(axis=1)))
    rng = np.random.default_rng(0)
    x = rng.standard_normal((16, nin)).astype(np.float32)
    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    y_ours = np.asarray(ours.apply({"params": params}, jnp.asarray(x)))

    ref = ref_mod.MLP(nin, nout, list(hidden), layers,
                      output_prune=True, strato_lev_out=15)
    ref.eval()
    for i in range(layers):
        lin = ref.linears[i][0]
        p = params[f"dense_{i}"]
        lin.weight.data = torch.from_numpy(np.asarray(p["kernel"]).T.copy())
        lin.bias.data = torch.from_numpy(np.asarray(p["bias"]).copy())
    ref.final_linear.weight.data = torch.from_numpy(
        np.asarray(params["head"]["kernel"]).T.copy())
    ref.final_linear.bias.data = torch.from_numpy(
        np.asarray(params["head"]["bias"]).copy())
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(x)).numpy()

    np.testing.assert_allclose(y_ours, y_ref, rtol=1e-5, atol=1e-6)
    # pruning active and scalars non-negative
    assert np.all(y_ours[:, 60:75] == 0.0)
    assert np.all(y_ours[:, -8:] >= 0.0)
