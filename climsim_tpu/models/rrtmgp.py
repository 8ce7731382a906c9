"""RRTMGP-NN gas-optics weight loading (gated on data availability).

The reference rebuilds frozen gas-optics MLPs from netCDF weight files
(rnn/utils.py:553-645 ``load_gas_optics_model`` /
``load_reduced_gas_optics_model`` using
rnn/data/rrtmgp-data-{lw-g128,sw-g112}-210809.nc). Those blobs are STRIPPED
from this snapshot (.MISSING_LARGE_BLOBS, SURVEY.md §7.3), so this module
provides the loader interface gated on file existence: when the netCDFs are
present the weights initialize ``GasOpticsMLP``-compatible parameter trees
(with optional last-layer reduction to fewer g-points, matching the
reference's 128/112 -> 16 retraining trick); otherwise callers fall back to
the trainable-from-scratch gas optics in models/phys_rad.py.
"""
from __future__ import annotations

import os

import numpy as np

DEFAULT_LW = "/root/reference/rnn/data/rrtmgp-data-lw-g128-210809.nc"
DEFAULT_SW = "/root/reference/rnn/data/rrtmgp-data-sw-g112-210809.nc"


def available(path: str = DEFAULT_LW) -> bool:
    """True when the RRTMGP weight netCDF is actually present (the stripped
    placeholder files are tiny or absent)."""
    try:
        return os.path.getsize(path) > 1 << 16
    except OSError:
        return False


def load_gas_optics_weights(path: str, reduce_to: int | None = None):
    """Load the RRTMGP-NN MLP weights into a parameter dict compatible with
    models.phys_rad.GasOpticsMLP ({'h0','h1','h2','out'} kernels/biases).

    Returns None when the blob is unavailable (gate for callers).
    ``reduce_to`` appends a randomly-initialized spectral-reduction layer
    mapping the native g-points down to ``reduce_to`` (the reference's
    trainable reducer, rnn/utils.py:553-613).
    """
    if not available(path):
        return None
    from ..io import read_netcdf

    raw = read_netcdf(path)
    # RRTMGP-NN convention: weights stored as wN/bN pairs
    params: dict = {}
    layer = 0
    while f"w{layer + 1}" in raw or f"weights_{layer}" in raw:
        w = raw.get(f"w{layer + 1}", raw.get(f"weights_{layer}"))
        b = raw.get(f"b{layer + 1}", raw.get(f"bias_{layer}"))
        name = f"h{layer}" if (f"w{layer + 2}" in raw
                               or f"weights_{layer + 1}" in raw) else "out"
        params[name] = {"kernel": np.asarray(w, np.float32).T,
                        "bias": np.asarray(b, np.float32).ravel()}
        layer += 1
    if not params:
        return None
    if reduce_to is not None:
        ng = params["out"]["kernel"].shape[1]
        rng = np.random.default_rng(0)
        params["reduce"] = {
            "kernel": rng.normal(0, 1.0 / np.sqrt(ng),
                                 (ng, reduce_to)).astype(np.float32),
            "bias": np.zeros(reduce_to, np.float32)}
    return params
