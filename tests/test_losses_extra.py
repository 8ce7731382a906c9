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
