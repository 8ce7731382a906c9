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
                   seed: int = 0, shuffle: bool = True) -> Iterator[dict]:
    """Yield time-contiguous chunk dicts from time-major arrays [T, B, ...]."""
    rng = np.random.default_rng(seed)
    for idx in chunkize(x_lev.shape[0], chunk_size, rng, shuffle):
        yield {"x_lev": x_lev[idx], "x_sfc": x_sfc[idx],
               "y_lev": y_lev[idx], "y_sfc": y_sfc[idx], "sp": sp[idx]}


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
