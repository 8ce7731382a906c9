"""Unified reader for the two netCDF flavors in the ClimSim data tree.

* classic CDF-1/2/5 (e.g. ``grid_info/ClimSim_low-res_grid-info.nc``) via the
  pure-Python parser in :mod:`climsim_tpu.io.cdf5`;
* netCDF4/HDF5 (the normalization files under ``preprocessing/normalizations``)
  via h5py.

Returns a plain ``dict[str, np.ndarray]`` — the framework keeps all static
metadata as host numpy and ships it to device once, as jnp constants.

Reference behaviour mirrored: climsim_utils/data_utils.py loads the same
files through xarray (``xr.open_dataset``).
"""
from __future__ import annotations

import numpy as np

from .cdf5 import open_cdf


def read_netcdf(path: str) -> dict[str, np.ndarray]:
    """Read every variable of a netCDF file into a dict of numpy arrays."""
    with open(path, "rb") as f:
        magic = f.read(8)
    if magic[:3] == b"CDF":
        ds = open_cdf(path)
        return {k: ds[k] for k in ds.keys()}
    if magic[:4] == b"\x89HDF":
        import h5py

        out: dict[str, np.ndarray] = {}
        with h5py.File(path, "r") as f:
            def visit(name, obj):
                if isinstance(obj, h5py.Dataset):
                    out[name] = np.asarray(obj[()])
            f.visititems(visit)
        return out
    raise ValueError(f"{path}: unrecognized netCDF container")
