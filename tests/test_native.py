"""Native host-loader tests: C++ kernels vs numpy references + throughput
sanity."""
import numpy as np
import pytest

from climsim_tpu.data import native


def test_native_available():
    # the toolchain exists in this image; the lib must build/load
    assert native.available()
    assert native.thread_count() >= 1


def test_gather_normalize_matches_numpy():
    rng = np.random.default_rng(0)
    src = rng.normal(0, 1, (1000, 60, 15)).astype(np.float32)
    idx = rng.permutation(1000)[:256]
    mean = rng.normal(0, 1, (60, 15)).astype(np.float32)
    div = (np.abs(rng.normal(1, 0.1, (60, 15))) + 0.1).astype(np.float32)
    got = native.gather_normalize(src, idx, mean, div)
    exp = (src[idx] - mean) / div
    np.testing.assert_allclose(got, exp, rtol=1e-6)


def test_gather_matches_numpy():
    rng = np.random.default_rng(1)
    src = rng.normal(0, 1, (500, 124)).astype(np.float32)
    idx = rng.integers(0, 500, 128)
    np.testing.assert_array_equal(native.gather(src, idx), src[idx])


def test_normalize_inplace():
    rng = np.random.default_rng(2)
    x = rng.normal(5, 2, (200, 124)).astype(np.float32)
    ref = x.copy()
    mean = x.mean(0).astype(np.float32)
    div = (x.std(0) + 0.1).astype(np.float32)
    native.normalize_inplace(x, mean, div)
    np.testing.assert_allclose(x, (ref - mean) / div, rtol=1e-5)


def test_cloud_exp_inplace():
    rng = np.random.default_rng(3)
    x = np.abs(rng.normal(0, 1e-4, (64, 60, 6))).astype(np.float32)
    ref = x.copy()
    lbd = np.linspace(1e3, 3e4, 60).astype(np.float32)
    native.cloud_exp_inplace(x, lbd, channel=2)
    # vectorized expf differs from numpy exp in the last ulp
    np.testing.assert_allclose(x[:, :, 2], 1 - np.exp(-ref[:, :, 2] * lbd),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_array_equal(x[:, :, 3], ref[:, :, 3])


def test_scrub_nonfinite():
    x = np.ones((100,), np.float32)
    x[3] = np.nan
    x[7] = np.inf
    x[11] = -np.inf
    native.scrub_nonfinite(x)
    assert np.isfinite(x).all()
    assert x[3] == 0 and x[7] == 0 and x[11] == 0
    assert x[0] == 1.0
