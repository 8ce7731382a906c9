"""Out-of-core streaming loader tests: chunk parity with the in-memory
path, prev-step channels, bounded memory, both storage backends, and a
streamed training epoch."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from climsim_tpu.data.loader import keeplev_chunks, stream_keeplev_chunks
from climsim_tpu.data.h5store import KeeplevReader, write_timeseries


def _series(T=12, B=8, L=6, nx=4, ns=5, ny=3, nys=2, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.normal(0, 1, (T, B, L, nx)).astype(np.float32),
            rng.normal(0, 1, (T, B, ns)).astype(np.float32),
            rng.normal(0, 1, (T, B, L, ny)).astype(np.float32),
            rng.normal(0, 1, (T, B, nys)).astype(np.float32))


def _write_h5(tmp_path, arrs):
    path = os.path.join(str(tmp_path), "stream.h5")
    write_timeseries(path, *arrs)
    return path


@pytest.mark.parametrize("ipi,ipo", [(0, 0), (2, 1)])
def test_stream_matches_in_memory_chunks(tmp_path, ipi, ipo):
    """Streamed chunks (same seed) == the in-memory keeplev_chunks over
    the same series, including prev-step channel assembly."""
    x_lev, x_sfc, y_lev, y_sfc = _series()
    path = _write_h5(tmp_path, (x_lev, x_sfc, y_lev, y_sfc))
    r = KeeplevReader(path)
    T, B = x_lev.shape[:2]
    sp = x_sfc[..., 0]

    ref = list(keeplev_chunks(x_lev, x_sfc, y_lev, y_sfc, sp,
                              chunk_size=4, seed=3, shuffle=True,
                              include_prev_inputs=ipi,
                              include_prev_outputs=ipo))
    got = list(stream_keeplev_chunks(r.load_slice, T, B, 4, seed=3,
                                     shuffle=True,
                                     include_prev_inputs=ipi,
                                     include_prev_outputs=ipo))
    assert len(ref) == len(got)
    for a, b in zip(ref, got):
        for k in a:
            np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                                       rtol=1e-6, err_msg=k)


def test_stream_transform_and_device_put(tmp_path):
    """The per-chunk transform runs in the reader thread and to_device
    yields jax arrays ready for the training step."""
    arrs = _series()
    path = _write_h5(tmp_path, arrs)
    r = KeeplevReader(path)
    T, B = arrs[0].shape[:2]
    mean = arrs[0].mean((0, 1))

    def tf(xl, xs, yl, ys):
        return {"x_lev": (xl - mean), "x_sfc": xs, "y_lev": yl,
                "y_sfc": ys, "sp": xs[..., 0]}

    chunks = list(stream_keeplev_chunks(r.load_slice, T, B, 3, seed=0,
                                        transform=tf, to_device=True))
    assert all(isinstance(c["x_lev"], jax.Array) for c in chunks)
    tot = sum(c["x_lev"].shape[0] for c in chunks)
    assert tot == (T // 3) * 3


def test_stream_tensorstore_backend(tmp_path):
    """Same stream through the sharded zarr store."""
    ts = pytest.importorskip("tensorstore")
    from climsim_tpu.data.tsstore import from_h5
    arrs = _series()
    path = _write_h5(tmp_path, arrs)
    store = from_h5(path, os.path.join(str(tmp_path), "zarr"))
    store = store.open()
    T, B = arrs[0].shape[:2]
    ref = list(stream_keeplev_chunks(KeeplevReader(path).load_slice, T, B,
                                     4, seed=1))
    got = list(stream_keeplev_chunks(store.read_rows, T, B, 4, seed=1))
    for a, b in zip(ref, got):
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]),
                                          np.asarray(b[k]))


def test_stream_reader_error_propagates(tmp_path):
    def bad_read(lo, hi):
        raise IOError("disk gone")
    with pytest.raises(IOError):
        list(stream_keeplev_chunks(bad_read, 8, 4, 2))


def test_streamed_training_epoch(tmp_path):
    """RolloutTrainer.run_epoch consumes the stream directly: loss equals
    the in-memory epoch on identical data/seed."""
    from climsim_tpu.grid import Grid
    from climsim_tpu.models.rnn import RNNAutoreg
    from climsim_tpu.train.rollout import RolloutTrainer, RolloutConfig

    x_lev, x_sfc, y_lev, y_sfc = _series(T=8, B=6, L=10, nx=6, ns=8,
                                         ny=6, nys=8)
    path = _write_h5(tmp_path, (x_lev, x_sfc, y_lev, y_sfc))
    r = KeeplevReader(path)
    g = Grid.from_file(
        "/root/reference/grid_info/ClimSim_low-res_grid-info.nc")
    model = RNNAutoreg(nx=6, nx_sfc=8, ny=6, ny_sfc=8, nneur=(8, 8),
                       nh_mem=2, add_pres=False)
    cfg = RolloutConfig(rollout_schedule={0: 2}, lr=1e-3)
    tr = RolloutTrainer(model, cfg, np.asarray(g.hyai)[:11],
                        np.asarray(g.hybi)[:11],
                        yscale_lev=jnp.ones((1, 1, 6)),
                        yscale_sca=jnp.ones(8))
    mem = jnp.zeros((6, 10, 2), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x_lev[0], x_sfc[0], mem)

    def run(chunks_iter):
        p = jax.tree_util.tree_map(jnp.copy, params)
        o = tr.tx.init(p)
        return tr.run_epoch(p, o, jnp.zeros((6, 10, 2), jnp.float32),
                            chunks_iter,
                            epoch=0)[3]["loss"]

    sp = x_sfc[..., 0]
    mem_loss = run(keeplev_chunks(x_lev, x_sfc, y_lev, y_sfc, sp,
                                  chunk_size=4, seed=2))
    stream_loss = run(stream_keeplev_chunks(r.load_slice, 8, 6, 4, seed=2,
                                            to_device=True))
    np.testing.assert_allclose(stream_loss, mem_loss, rtol=1e-6)
