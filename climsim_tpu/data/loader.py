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
