"""Raw netCDF -> keeplev ingestion: the L2 preprocessing driver.

Equivalent of the reference's canonical preprocessing sequence
(preprocessing/create_npy_data_new.py + data_utils.save_as_h5_keeplev_new,
SURVEY.md §3.1): for each mli/mlo file pair, read the input variables
(deriving state_rh / state_qn / liq_partition / icol when absent,
data_utils.get_xrdata:654-711), build tendency targets
(get_target:720-747), optionally normalize, and append to the keeplev H5
(or TensorStore) store.

Files are read with climsim_tpu.io (classic CDF + HDF5 netCDF4 both
supported). Variables are expected as [ncol] or [ncol, nlev] (or
transposed [nlev, ncol], auto-detected).
"""
from __future__ import annotations

import numpy as np

from .. import constants as C
from .. import variables as V
from ..io import read_netcdf
from ..physics import thermo
from .h5store import KeeplevReader, KeeplevWriter

import jax.numpy as jnp


def _shape_fix(a: np.ndarray, ncol: int, nlev: int) -> np.ndarray:
    a = np.asarray(a)
    a = a.squeeze()
    if a.ndim == 2 and a.shape == (nlev, ncol):
        a = a.T
    return a


def derive_missing(data: dict, vset: V.VariableSet, grid,
                   ncol: int, nlev: int) -> dict:
    """Derived inputs when absent from file (data_utils.get_xrdata)."""
    out = dict(data)
    names = set(vset.inputs.names)
    if "state_rh" in names and "state_rh" not in out:
        pmid = out.get("state_pmid")
        if pmid is None:
            pmid = np.asarray(grid.mid_pressure(
                jnp.asarray(out["state_ps"], jnp.float64)))
        T = out["state_t"]
        # the reference uses the omega-blended eliq/eice qsat here
        out["state_rh"] = np.asarray(thermo.specific_to_relative_humidity(
            jnp.asarray(out["state_q0001"]), jnp.asarray(T),
            jnp.asarray(pmid)))
    if "state_qn" in names and "state_qn" not in out:
        out["state_qn"] = out["state_q0002"] + out["state_q0003"]
    if "liq_partition" in names and "liq_partition" not in out:
        out["liq_partition"] = np.asarray(
            thermo.liquid_fraction(jnp.asarray(out["state_t"])))
    if "icol" in names and "icol" not in out:
        out["icol"] = np.arange(1, ncol + 1, dtype=np.float64)
    for nm in ("state_qn_prvphy", "tm_state_qn_prvphy"):
        base = nm.replace("qn", "q0002"), nm.replace("qn", "q0003")
        if nm in names and nm not in out and all(b in out for b in base):
            out[nm] = out[base[0]] + out[base[1]]
    # cos/sin latitude from the grid file (the reference adds these from
    # grid info, not the mli archive: climsim_adding_input.py)
    if "clat" in names and "clat" not in out:
        out["clat"] = np.cos(np.deg2rad(np.asarray(grid.lat)[:ncol]))
    if "slat" in names and "slat" not in out:
        out["slat"] = np.sin(np.deg2rad(np.asarray(grid.lat)[:ncol]))
    return out


def build_targets(mli: dict, mlo: dict, vset: V.VariableSet) -> dict:
    """Tendencies (mlo-mli)/1200 + passthrough surface outputs
    (data_utils.get_target)."""
    t: dict = {}
    dt = C.DT_STEP
    t["ptend_t"] = (mlo["state_t"] - mli["state_t"]) / dt
    t["ptend_q0001"] = (mlo["state_q0001"] - mli["state_q0001"]) / dt
    if vset.full_vars:
        t["ptend_q0002"] = (mlo["state_q0002"] - mli["state_q0002"]) / dt
        t["ptend_q0003"] = (mlo["state_q0003"] - mli["state_q0003"]) / dt
        t["ptend_u"] = (mlo["state_u"] - mli["state_u"]) / dt
        t["ptend_v"] = (mlo["state_v"] - mli["state_v"]) / dt
    elif vset.full_vars_v5:
        t["ptend_qn"] = ((mlo["state_q0002"] - mli["state_q0002"])
                         + (mlo["state_q0003"] - mli["state_q0003"])) / dt
        t["ptend_u"] = (mlo["state_u"] - mli["state_u"]) / dt
        t["ptend_v"] = (mlo["state_v"] - mli["state_v"]) / dt
    for name in vset.outputs.sfc_names:
        t[name] = mlo[name]
    return t


def pack_pair(mli_path: str, mlo_path: str, vset: V.VariableSet, grid,
              normalizer=None):
    """One file pair -> keeplev 4-tuple (np arrays [ncol, ...])."""
    mli_raw = read_netcdf(mli_path)
    mlo_raw = read_netcdf(mlo_path)
    ncol, nlev = grid.ncol, grid.nlev
    mli = {k: _shape_fix(v, ncol, nlev) for k, v in mli_raw.items()}
    mlo = {k: _shape_fix(v, ncol, nlev) for k, v in mlo_raw.items()}
    mli = derive_missing(mli, vset, grid, ncol, nlev)
    tgt = build_targets(mli, mlo, vset)

    def stack(names, src):
        return np.stack([np.broadcast_to(np.asarray(src[n], np.float32),
                                         (ncol, nlev) if V.var_len(n) == nlev
                                         else (ncol,))
                         for n in names], axis=-1)

    x_lev = stack(vset.inputs.lev_names, mli)
    x_sfc = stack(vset.inputs.sfc_names, mli)
    y_lev = stack(vset.outputs.lev_names, tgt)
    y_sfc = stack(vset.outputs.sfc_names, tgt)
    if normalizer is not None:
        xl, xs = normalizer.normalize(jnp.asarray(x_lev),
                                      jnp.asarray(x_sfc))
        yl, ys = normalizer.scale_output(jnp.asarray(y_lev),
                                         jnp.asarray(y_sfc))
        x_lev, x_sfc = np.asarray(xl), np.asarray(xs)
        y_lev, y_sfc = np.asarray(yl), np.asarray(ys)
    return x_lev, x_sfc, y_lev, y_sfc


def keeplev_to_flat(x_lev, x_sfc, layout):
    """Keeplev arrays ([N, L, n_lev_vars] in lev_names order + [N, n_sfc])
    -> the flat registry-ordered vector [N, feature_len]
    (data_utils.py:1202-1293 flattened-generator contract)."""
    lev_names = list(layout.lev_names)
    sfc_names = list(layout.sfc_names)
    parts = []
    for n in layout.names:
        if n in lev_names:
            parts.append(np.asarray(x_lev[..., lev_names.index(n)]))
        else:
            parts.append(np.asarray(x_sfc[..., sfc_names.index(n)])[:, None])
    return np.concatenate(parts, axis=1).astype(np.float32)


def save_as_npy(source, vset: V.VariableSet, save_path: str,
                data_split: str = "train", save_npy: bool = True,
                save_h5: bool = False, grid=None,
                save_latlontime: bool = False, dates=None) -> tuple:
    """Export a split as ``{split}_input.npy`` / ``{split}_target.npy``
    (+ optional .h5 twins and the index->(lat,lon,date) pickle) — the
    reference's ``save_as_npy`` (climsim_utils/data_utils.py:1295-1355).

    ``source``: a keeplev H5 path, a KeeplevReader, or a 4-tuple of
    keeplev arrays. NaN/Inf are scrubbed to 0 as the reference does.
    """
    import os
    import pickle

    if isinstance(source, str):
        source = KeeplevReader(source)
    if hasattr(source, "load_all"):
        d = source.load_all()
        arrs = (d["input_lev"], d["input_sca"],
                d["output_lev"], d["output_sca"])
    else:
        arrs = source
    x = keeplev_to_flat(arrs[0], arrs[1], vset.inputs)
    y = keeplev_to_flat(arrs[2], arrs[3], vset.outputs)
    x[~np.isfinite(x)] = 0.0
    y[~np.isfinite(y)] = 0.0

    os.makedirs(save_path, exist_ok=True)
    paths = []
    for tag, a in (("input", x), ("target", y)):
        if save_npy:
            p = os.path.join(save_path, f"{data_split}_{tag}.npy")
            np.save(p, a)
            paths.append(p)
        if save_h5:
            import h5py
            p = os.path.join(save_path, f"{data_split}_{tag}.h5")
            with h5py.File(p, "w") as hdf:
                hdf.create_dataset("data", data=a, dtype=a.dtype)
            paths.append(p)
    if save_latlontime and grid is not None:
        ncol = grid.ncol
        lat = np.asarray(grid.lat)
        lon = np.asarray(grid.lon)
        dates = list(dates or [])
        latlontime = {
            i: [(float(lat[i % ncol]), float(lon[i % ncol])),
                dates[i // ncol] if i // ncol < len(dates) else None]
            for i in range(x.shape[0])}
        p = os.path.join(save_path, f"{data_split}_indextolatlontime.pkl")
        with open(p, "wb") as f:
            pickle.dump(latlontime, f)
        paths.append(p)
    return tuple(paths)


def ingest(filelists, vset: V.VariableSet, grid, out_path: str,
           split: str = "train", normalizer=None,
           progress: bool = False) -> int:
    """Run the full pipeline over a split's file list into a keeplev H5.
    Returns rows written."""
    files = filelists.get_filelist(split)
    varnames = {"input_lev": list(vset.inputs.lev_names),
                "input_sca": list(vset.inputs.sfc_names),
                "output_lev": list(vset.outputs.lev_names),
                "output_sca": list(vset.outputs.sfc_names)}
    n = 0
    with KeeplevWriter(out_path, varnames=varnames) as w:
        for i, f in enumerate(files):
            pair = pack_pair(f, filelists.output_path(f), vset, grid,
                             normalizer)
            w.append(*pair)
            n += pair[0].shape[0]
            if progress and i % 50 == 0:
                print(f"[ingest] {i + 1}/{len(files)} files, {n} rows")
    return n
