"""Batch iterators: time-chunked autoregressive loader + device prefetch.

Re-designs the reference's chunked loading (rnn/utils.py:1868-2434
``generator_xy`` + ``BatchSampler.chunkize``): chunks are CONTIGUOUS time
steps (load-bearing for autoregression — the memory threads through them in
order) while the chunk order is shuffled per epoch. The shared-memory
``mp.Array`` RAM cache becomes a plain device-resident array here — the
whole low-res dataset fits in HBM, and the normalization that the reference
runs in numba worker processes happens on device, fused by XLA.

``prefetch_to_device`` double-buffers host->device transfers for the flat
training loops (replacing torch DataLoader workers + pinned memory).
"""
from __future__ import annotations

from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np


def chunkize(n_steps: int, chunk_size: int, rng: np.random.Generator,
             shuffle: bool = True) -> list[np.ndarray]:
    """Split [0..n_steps) into contiguous chunks; shuffle chunk order only
    (rnn/utils.py:2383-2431)."""
    starts = np.arange(0, n_steps - chunk_size + 1, chunk_size)
    if shuffle:
        rng.shuffle(starts)
    return [np.arange(s, s + chunk_size) for s in starts]


def keeplev_chunks(x_lev, x_sfc, y_lev, y_sfc, sp, chunk_size: int,
                   seed: int = 0, shuffle: bool = True,
                   include_prev_inputs: int = 0,
                   include_prev_outputs: int = 0) -> Iterator[dict]:
    """Yield time-contiguous chunk dicts from time-major arrays [T, B, ...].

    ``include_prev_inputs``/``include_prev_outputs`` concatenate the first
    N level channels of the PREVIOUS timestep's inputs/outputs onto each
    step's level inputs (the reference loader's prev-step channels,
    rnn/utils.py:2095-2148; it uses 6 input / 5 output channels). Chunks
    then start at t>=1 so every step has a predecessor, matching the
    reference's "first time index cannot be zero" contract.
    """
    rng = np.random.default_rng(seed)
    # device-resident series (jnp arrays) chunk on-device: the gather and
    # concatenates run on the accelerator and the training loop never
    # re-uploads the epoch's data through the host
    xp = jnp if isinstance(x_lev, jnp.ndarray) else np
    offset = 1 if (include_prev_inputs or include_prev_outputs) else 0
    for idx in chunkize(x_lev.shape[0] - offset, chunk_size, rng, shuffle):
        idx = idx + offset
        xl = x_lev[idx]
        if include_prev_outputs:
            xl = xp.concatenate(
                [xl, y_lev[idx - 1][..., :include_prev_outputs]], axis=-1)
        if include_prev_inputs:
            xl = xp.concatenate(
                [xl, x_lev[idx - 1][..., :include_prev_inputs]], axis=-1)
        yield {"x_lev": xl, "x_sfc": x_sfc[idx],
               "y_lev": y_lev[idx], "y_sfc": y_sfc[idx], "sp": sp[idx]}


def stream_keeplev_chunks(read_rows, n_steps: int, ncol: int,
                          chunk_size: int, *, seed: int = 0,
                          shuffle: bool = True,
                          include_prev_inputs: int = 0,
                          include_prev_outputs: int = 0,
                          transform=None, raw_transform=None,
                          prefetch: int = 2, to_device: bool = False,
                          t_start: int = 0,
                          t_stop: int | None = None) -> Iterator[dict]:
    """Out-of-core chunk stream: train on datasets far larger than host
    RAM + HBM (the role of the reference's worker processes + shared-
    memory ``mp.Array`` cache, rnn/utils.py:2033-2061,2119 — rebuilt as a
    bounded-memory pipeline instead of a full-RAM cache).

    ``read_rows(start_row, stop_row)`` fetches flattened (time x col)
    rows from any backing store (h5store.KeeplevReader.load_slice,
    tsstore.TsKeeplevStore.read_rows) and returns the keeplev dict
    {input_lev, input_sca, output_lev, output_sca}. Chunks are
    time-CONTIGUOUS (autoregression) in shuffled order; a background
    thread reads + preprocesses chunk k+1 while chunk k trains, and
    ``to_device=True`` additionally device_puts inside the reader thread
    so the H2D copy overlaps compute too. Peak host memory is
    O(prefetch x chunk bytes), independent of dataset size.

    ``transform(x_lev, x_sfc, y_lev, y_sfc) -> dict`` applies the
    normalization/feature chain per chunk (arrays arrive time-major
    [cs, B, ...]); the default packs raw arrays with sp = x_sfc[..., 0].
    Prev-step channels follow keeplev_chunks semantics (chunks start at
    t >= 1 so every step has a predecessor). When the feature chain must
    see the raw predecessor row (e.g. to normalize BEFORE assembling
    prev-step channels), pass ``raw_transform(xl, xs, yl, ys, offset) ->
    dict`` instead: it receives the FULL window [cs+offset, B, ...] and
    owns the whole assembly. ``t_start``/``t_stop`` restrict the stream
    to a step range (train/val splits over one store).
    """
    import queue as _queue
    import threading

    rng = np.random.default_rng(seed)
    offset = 1 if (include_prev_inputs or include_prev_outputs) else 0
    t_stop = n_steps if t_stop is None else min(t_stop, n_steps)
    span = t_stop - t_start - offset
    starts = [int(i[0]) + t_start + offset
              for i in chunkize(span, chunk_size, rng, shuffle)]

    def default_transform(xl, xs, yl, ys):
        return {"x_lev": xl, "x_sfc": xs, "y_lev": yl, "y_sfc": ys,
                "sp": xs[..., 0]}

    tf = transform if transform is not None else default_transform
    q: _queue.Queue = _queue.Queue(maxsize=max(1, prefetch))
    SENTINEL = object()

    def reader():
        try:
            for t0 in starts:
                lo = (t0 - offset) * ncol
                hi = (t0 + chunk_size) * ncol
                d = read_rows(lo, hi)
                resh = lambda a: np.asarray(a).reshape(
                    (chunk_size + offset, ncol) + a.shape[1:])
                xl = resh(d["input_lev"])
                xs = resh(d["input_sca"])
                yl = resh(d["output_lev"])
                ys = resh(d["output_sca"])
                if raw_transform is not None:
                    out = raw_transform(xl, xs, yl, ys, offset)
                else:
                    xl_c, xs_c = xl[offset:], xs[offset:]
                    if include_prev_outputs:
                        xl_c = np.concatenate(
                            [xl_c, yl[:-1][..., :include_prev_outputs]],
                            axis=-1)
                    if include_prev_inputs:
                        xl_c = np.concatenate(
                            [xl_c, xl[:-1][..., :include_prev_inputs]],
                            axis=-1)
                    out = tf(xl_c, xs_c, yl[offset:], ys[offset:])
                if to_device:
                    out = jax.device_put(out)
                q.put(out)
            q.put(SENTINEL)
        except BaseException as e:      # surface reader errors to consumer
            q.put(e)

    th = threading.Thread(target=reader, daemon=True)
    th.start()
    while True:
        item = q.get()
        if item is SENTINEL:
            break
        if isinstance(item, BaseException):
            raise item
        yield item
    th.join()


def prefetch_to_device(iterator, size: int = 2):
    """Double-buffered host->device pipeline: device_put the next batch while
    the current one computes."""
    queue = []
    it = iter(iterator)
    try:
        for _ in range(size):
            queue.append(jax.device_put(next(it)))
    except StopIteration:
        pass
    while queue:
        out = queue.pop(0)
        try:
            queue.append(jax.device_put(next(it)))
        except StopIteration:
            pass
        yield out


def flat_batches(x: np.ndarray, y: np.ndarray, batch_size: int,
                 seed: int = 0, shuffle: bool = True,
                 drop_remainder: bool = True):
    """Shuffled minibatch iterator over flat arrays (the offline baselines'
    path), usable inside ``prefetch_to_device``."""
    n = x.shape[0]
    idx = np.arange(n)
    if shuffle:
        np.random.default_rng(seed).shuffle(idx)
    stop = n - batch_size + 1 if drop_remainder else n
    for i in range(0, stop, batch_size):
        j = idx[i:i + batch_size]
        yield x[j], y[j]
