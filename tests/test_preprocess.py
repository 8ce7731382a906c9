"""Training-side input preprocessing chain (data/preprocess.py) — the
reference generator_xy rewrites (rnn/utils.py:2160-2250): snowhice fix,
rh prune, rh->q (replace or append), v4->v5 conversion, exp/sqrt cloud
transforms, stratospheric q-input pruning."""
import numpy as np
import jax.numpy as jnp

from climsim_tpu.data.preprocess import (PreprocessConfig, _rh_to_q,
                                         preprocess_level_inputs)
from climsim_tpu.physics import thermo


def test_rh_to_q_matches_jnp_thermo():
    T = np.linspace(180.0, 320.0, 57).astype(np.float32)
    p = np.linspace(100.0, 1.0e5, 57).astype(np.float32)
    rh = np.linspace(0.0, 1.2, 57).astype(np.float32)
    q_np = _rh_to_q(rh, T, p)
    q_jx = np.asarray(thermo.relative_to_specific_humidity(
        jnp.asarray(rh), jnp.asarray(T), jnp.asarray(p)))
    np.testing.assert_allclose(q_np, q_jx, rtol=1e-6)


def _raw(B=4, L=60, nx=8, ns=6, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(0, 1, (B, L, nx)).astype(np.float32)
    x[..., 0] = rng.uniform(200, 300, (B, L))      # T
    x[..., 1] = rng.uniform(0, 1.5, (B, L))        # rh (some >1.2)
    x[..., 2] = rng.uniform(0, 1e-4, (B, L))       # qc
    x[..., 3] = rng.uniform(0, 1e-4, (B, L))       # qi
    s = rng.normal(0, 1, (B, ns)).astype(np.float32)
    s[..., 0] = rng.uniform(9.6e4, 1.03e5, B)      # sp
    s[1, 3] = 2.0e10                               # snowhice sentinel
    return x, s


def test_snowhice_rhprune_and_q_append():
    x, s = _raw()
    hyam = np.linspace(0, 0.1, 60).astype(np.float32)
    hybm = np.linspace(0.05, 0.99, 60).astype(np.float32)
    cfg = PreprocessConfig(snowhice_fix=True, rh_prune=True,
                           rh_input_to_q=True, include_q_input=True,
                           cld_inp_transformation="none")
    xp, xd, sp_ = preprocess_level_inputs(x, s, hyam, hybm, cfg)
    assert sp_[1, 3] == -1.0                       # sentinel fixed
    assert xp.shape[-1] == x.shape[-1] + 1         # q appended
    assert np.all(xp[..., 1] <= 1.2)               # rh clipped
    p = s[..., 0:1] * hybm + 1e5 * hyam
    rh_c = np.clip(x[..., 1], 0.0, 1.2)
    np.testing.assert_allclose(xp[..., -1], _rh_to_q(rh_c, x[..., 0], p),
                               rtol=1e-6)
    # denorm snapshot equals the post-humidity state (cld untouched here)
    np.testing.assert_allclose(xd, xp, rtol=1e-7)


def test_rh_replace_and_exp_transform():
    x, s = _raw(seed=1)
    hyam = np.linspace(0, 0.1, 60).astype(np.float32)
    hybm = np.linspace(0.05, 0.99, 60).astype(np.float32)
    lbd = np.full(60, 1.0e4, np.float32)
    cfg = PreprocessConfig(rh_input_to_q=True, include_q_input=False,
                           cld_inp_transformation="exp")
    xp, xd, _ = preprocess_level_inputs(x, s, hyam, hybm, cfg,
                                        lbd_qc=lbd, lbd_qi=lbd)
    assert xp.shape[-1] == x.shape[-1]             # replaced, not appended
    assert not np.allclose(xp[..., 1], x[..., 1])  # rh -> q
    np.testing.assert_allclose(xd[..., 1], xp[..., 1])   # snapshot has q
    # exp transform on qc/qi; snapshot keeps raw condensate
    np.testing.assert_allclose(xp[..., 2], 1 - np.exp(-x[..., 2] * lbd),
                               rtol=1e-6)
    np.testing.assert_allclose(xd[..., 2], x[..., 2])


def test_v4_to_v5_with_prune_and_sqrt():
    x, s = _raw(seed=2)
    hyam = np.zeros(60, np.float32)
    hybm = np.ones(60, np.float32)
    cfg = PreprocessConfig(v4_to_v5_inputs=True,
                           cld_inp_transformation="sqrt",
                           qinput_prune=True, qinput_prune_lev=15)
    xp, xd, _ = preprocess_level_inputs(x, s, hyam, hybm, cfg)
    qn = x[..., 2] + x[..., 3]
    qn[..., :15] = 0.0
    np.testing.assert_allclose(xp[..., 2], np.sqrt(np.sqrt(qn)), rtol=1e-6)
    np.testing.assert_allclose(
        xp[..., 3], np.clip((x[..., 0] - 253.16) / 20.0, 0, 1), rtol=1e-6)
    # snapshot keeps the raw qc/qi channels
    np.testing.assert_allclose(xd[..., 2], x[..., 2])
    np.testing.assert_allclose(xd[..., 3], x[..., 3])


def test_qinput_prune_non_v4_path():
    x, s = _raw(seed=3)
    cfg = PreprocessConfig(cld_inp_transformation="none", qinput_prune=True)
    xp, _, _ = preprocess_level_inputs(x, s, np.zeros(60), np.ones(60), cfg)
    assert np.all(xp[..., :15, 2] == 0.0)
    np.testing.assert_allclose(xp[..., 15:, 2], x[..., 15:, 2])
    # qi untouched on this path (reference zeroes only channel 2, :2246)
    np.testing.assert_allclose(xp[..., 3], x[..., 3])


def test_invalid_transform_rejected():
    import pytest
    with pytest.raises(ValueError):
        PreprocessConfig(cld_inp_transformation="log")
