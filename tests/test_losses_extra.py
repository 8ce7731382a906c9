"""Extra loss tests: RH-consistency (CC parity vs reference torch),
file-list management."""
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from climsim_tpu.physics import thermo
from climsim_tpu.train.losses import rh_consistency_loss


def test_cc_rh_parity_with_reference():
    torch = pytest.importorskip("torch")
    sys.path.insert(0, "/root/reference/rnn")
    import metrics as ref_metrics

    rng = np.random.default_rng(0)
    q = np.abs(rng.normal(5e-3, 2e-3, (100,))).astype(np.float32)
    T = rng.uniform(250, 310, 100).astype(np.float32)
    p = rng.uniform(5e4, 1.01e5, 100).astype(np.float32)
    ref_rh = ref_metrics.specific_to_relative_humidity_torch_cc(
        torch.from_numpy(q), torch.from_numpy(T),
        torch.from_numpy(p)).numpy()
    ours = np.asarray(thermo.specific_to_relative_humidity_cc(
        jnp.asarray(q), jnp.asarray(T), jnp.asarray(p)))
    np.testing.assert_allclose(ours, ref_rh, rtol=1e-5)
    ref_ex = ref_metrics.specific_to_relative_humidity_torch_cc(
        torch.from_numpy(q), torch.from_numpy(T), torch.from_numpy(p),
        return_excess=True).numpy()
    ours_ex = np.asarray(thermo.specific_to_relative_humidity_cc(
        jnp.asarray(q), jnp.asarray(T), jnp.asarray(p),
        return_excess=True))
    np.testing.assert_allclose(ours_ex, ref_ex, rtol=1e-4, atol=1e-10)


def test_rh_loss_zero_when_subsaturated_positive_when_super():
    B, L = 8, 60
    qv = jnp.full((B, L), 1e-4)
    T = jnp.full((B, L), 280.0)
    p = jnp.full((B, L), 9e4)
    zero = rh_consistency_loss(jnp.zeros((B, L)), jnp.zeros((B, L)), qv, T, p)
    assert float(zero) == 0.0
    # huge moistening -> supersaturation penalty
    big = rh_consistency_loss(jnp.full((B, L), 1e-4), jnp.zeros((B, L)),
                              qv, T, p)
    assert float(big) > 0
    g = jax.grad(lambda d: rh_consistency_loss(d, jnp.zeros((B, L)), qv, T,
                                               p))(jnp.full((B, L), 1e-4))
    assert np.isfinite(np.asarray(g)).all()


def test_filelist_management(tmp_path):
    from climsim_tpu.data.filelist import FileLists, official_split_regexps
    d = tmp_path / "0001-02"
    d.mkdir()
    for i in range(20):
        (d / f"E3SM-MMF.mli.0001-02-{i:02d}-00000.nc").touch()
        (d / f"E3SM-MMF.mlo.0001-02-{i:02d}-00000.nc").touch()
    fl = FileLists(str(tmp_path))
    fl.set_regexps("train", ["*/E3SM-MMF.mli.0001-*.nc"])
    fl.set_stride_sample("train", 7)
    files = fl.get_filelist("train")
    assert len(files) == 3   # 20 files stride 7 -> ceil
    assert all(".mli." in f for f in files)
    out = fl.output_path(files[0])
    assert ".mlo." in out
    rx = official_split_regexps()
    assert "train" in rx and len(rx["train"]) == 8


def test_gel_losses_parity_vs_reference():
    """gel_loss / gel_precip_loss == the reference get_GEL/get_GEL_precip
    closures (rnn/metrics.py:1035-1105) on positive random data."""
    import sys
    import torch
    sys.path.insert(0, "/root/reference/rnn")
    import metrics as ref_metrics

    from climsim_tpu.train.losses import gel_loss, gel_precip_loss

    rng = np.random.default_rng(0)
    y_t = np.abs(rng.normal(1.0, 0.5, (96, 60))).astype(np.float32) * 1e5
    y_p = np.abs(rng.normal(1.0, 0.5, (96, 60))).astype(np.float32) * 1e5
    for lam in (0.5, 1.0, 2.0):
        ref = ref_metrics.get_GEL(lam)(torch.from_numpy(y_t),
                                       torch.from_numpy(y_p))
        ours = gel_loss(jnp.asarray(y_p), jnp.asarray(y_t), lam=lam)
        np.testing.assert_allclose(float(ours), float(ref), rtol=1e-4)

    T, B = 4, 24
    sfc_t = np.abs(rng.normal(1e-5, 5e-6, (T * B, 8))).astype(np.float32)
    sfc_p = np.abs(rng.normal(1e-5, 5e-6, (T * B, 8))).astype(np.float32)
    for lam in (0.5, 1.0):
        ref = ref_metrics.get_GEL_precip(lam)(
            torch.from_numpy(sfc_t), torch.from_numpy(sfc_p), T)
        ours = gel_precip_loss(jnp.asarray(sfc_t), jnp.asarray(sfc_p), T,
                               lam=lam)
        np.testing.assert_allclose(float(ours), float(ref), rtol=1e-4)


def test_gel_loss_zero_at_unit_scaled_match():
    """GEL is ~0 when pred == target and the fac-scaled values are 1
    (alpha=beta=1 -> diff=1 -> E=1/lam -> |2^(1/lam) - 2^(1/lam)| = 0);
    finite and non-negative elsewhere."""
    from climsim_tpu.train.losses import gel_loss
    t = jnp.full((32, 60), 1e5)        # fac=1e-5 -> scaled exactly 1
    assert float(gel_loss(t, t)) < 1e-5
    rng = np.random.default_rng(1)
    r = jnp.asarray(np.abs(rng.normal(1, 0.3, (32, 60))) * 1e5)
    v = float(gel_loss(r * 1.5, r))
    assert np.isfinite(v) and v >= 0.0


def test_absolute_bias_loss_parity_vs_reference():
    """absolute_bias_loss == the reference compute_absolute_biases
    reduction (abs of batch-mean diffs, level-mean below level 12,
    concat + nanmean)."""
    import torch
    sys.path.insert(0, "/root/reference/rnn")
    import metrics as ref_metrics
    from climsim_tpu.train.losses import absolute_bias_loss

    rng = np.random.default_rng(3)
    N, L, ny, ns = 64, 60, 6, 8
    tl = rng.normal(0, 1, (N, L, ny)).astype(np.float32)
    pl_ = rng.normal(0.2, 1, (N, L, ny)).astype(np.float32)
    ts = rng.normal(0, 1, (N, ns)).astype(np.float32)
    ps = rng.normal(-0.1, 1, (N, ns)).astype(np.float32)
    bl, bs = ref_metrics.compute_absolute_biases(
        torch.from_numpy(tl[:, 12:]), torch.from_numpy(ts),
        torch.from_numpy(pl_[:, 12:]), torch.from_numpy(ps))
    ref = float(torch.nanmean(torch.cat((bl, bs))))
    ours = float(absolute_bias_loss(jnp.asarray(pl_), jnp.asarray(tl),
                                    jnp.asarray(ps), jnp.asarray(ts)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)
