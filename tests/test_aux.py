"""Aux-subsystem tests: RRTMGP gate, Kaggle helper, dataset statistics,
export validation harness."""
import os

import jax
import jax.numpy as jnp
import numpy as np

K = jax.random.PRNGKey


def test_rrtmgp_gate():
    from climsim_tpu.models import rrtmgp
    # the real RRTMGP-NN weight files ship with the reference snapshot
    # (deep parity in tests/test_rrtmgp.py); missing paths gate to None
    assert rrtmgp.available(rrtmgp.DEFAULT_LW) is True
    assert rrtmgp.load_gas_optics_weights(rrtmgp.DEFAULT_LW) is not None
    assert rrtmgp.load_gas_optics_weights("/nonexistent.nc") is None


def test_kaggle_helper(tmp_path):
    from climsim_tpu.data.kaggle import kaggle_index_lists, \
        export_kaggle_files
    from climsim_tpu.data import Normalizer
    from climsim_tpu import variables as V

    kept, dropped, zeroed = kaggle_index_lists("v2")
    assert len(kept) + len(dropped) == 557
    # SNOWHICE is a scalar -> exactly 1 dropped index
    assert len(dropped) == 1
    assert len(zeroed) == 60   # ptend_q0002 block
    nz = Normalizer.identity(V.get("v2"))
    info = export_kaggle_files(nz, str(tmp_path), "v2")
    for f in ("inp_sub.txt", "inp_div.txt", "out_scale.txt",
              "input_kept_idx.txt", "output_zeroed_idx.txt"):
        assert os.path.exists(tmp_path / f)
    assert info["kept"] == 556


def test_dataset_statistics(tmp_path):
    from climsim_tpu.data.statistics import (dataset_statistics,
                                             level_statistics,
                                             save_statistics)
    rng = np.random.default_rng(0)
    x = rng.normal(2.0, 3.0, (500, 124)).astype(np.float32)
    stats = dataset_statistics(x, "v1", "inputs", nbins=20)
    assert "state_t" in stats and "pbuf_SHFLX" in stats
    st = stats["state_t"]
    assert st["mean"].shape == (60,)
    np.testing.assert_allclose(st["mean"], x[:, :60].mean(0), rtol=1e-6)
    assert st["hist"].shape == (60, 20)
    assert st["hist"].sum() == 500 * 60
    sc = stats["pbuf_SHFLX"]
    assert sc["mean"].shape == (1,)
    save_statistics(stats, str(tmp_path / "s.json"))
    assert os.path.getsize(tmp_path / "s.json") > 1000


def test_export_validation_harness():
    from climsim_tpu.export.validate import validate_export

    T, B, L, ny, ns = 4, 8, 60, 6, 8

    def fake_wrapper(xm, xs, mem):
        out = 0.1 * xm[..., :ny]
        return out, jnp.zeros((xm.shape[0], ns)), mem + 1.0

    rng = np.random.default_rng(1)
    xm = jnp.asarray(rng.normal(0, 1, (T, B, L, ny)).astype(np.float32))
    xs = jnp.asarray(rng.normal(0, 1, (T, B, ns)).astype(np.float32))
    yt = 0.1 * xm    # the wrapper is exact -> zero error
    yts = jnp.zeros((T, B, ns))
    rep = validate_export(fake_wrapper, xm, xs, yt, yts,
                          jnp.zeros((B, L, 4)))
    assert rep["passed"]
    np.testing.assert_allclose(rep["lev_rmse"], 0.0, atol=1e-7)
    np.testing.assert_allclose(rep["rel_rmse"], 0.0, atol=1e-6)


def test_flop_analysis_matmul():
    """Compiler cost analysis of a matmul reports ~2*M*N*K FLOPs and
    positive arithmetic intensity."""
    import jax.numpy as jnp
    from climsim_tpu.utils.observability import (flop_analysis,
                                                 achieved_flops)

    M = N = K = 256
    a = jnp.ones((M, K), jnp.float32)
    b = jnp.ones((K, N), jnp.float32)
    cost = flop_analysis(lambda a, b: a @ b, a, b)
    if not cost:  # backend without cost analysis: nothing to assert
        return
    assert abs(cost["flops"] - 2 * M * N * K) / (2 * M * N * K) < 0.5
    res = achieved_flops(lambda a, b: a @ b, a, b, iters=3)
    assert res["seconds_per_call"] > 0
    if "achieved_flops_per_s" in res:
        assert res["achieved_flops_per_s"] > 0
