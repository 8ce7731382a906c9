"""End-to-end ingestion test: synthetic raw netCDF (HDF5 container) file
pairs -> keeplev H5 through the full preprocessing pipeline."""
import h5py
import numpy as np
import jax.numpy as jnp

from climsim_tpu.grid import Grid
from climsim_tpu import variables as V
from climsim_tpu.data.filelist import FileLists
from climsim_tpu.data.ingest import ingest, pack_pair
from climsim_tpu.data.h5store import KeeplevReader

GRID_PATH = "/root/reference/grid_info/ClimSim_low-res_grid-info.nc"


def _write_pair(dirpath, stamp, ncol=384, nlev=60, seed=0):
    """Create mli/mlo files as HDF5 (readable by climsim_tpu.io) with the
    raw variable set of the low-res archive."""
    rng = np.random.default_rng(seed)
    T = rng.uniform(210, 300, (ncol, nlev))
    base = {
        "state_t": T,
        "state_q0001": np.abs(rng.normal(1e-3, 3e-4, (ncol, nlev))),
        "state_q0002": np.abs(rng.normal(1e-5, 3e-6, (ncol, nlev))),
        "state_q0003": np.abs(rng.normal(1e-5, 3e-6, (ncol, nlev))),
        "state_u": rng.normal(0, 10, (ncol, nlev)),
        "state_v": rng.normal(0, 3, (ncol, nlev)),
        "state_ps": rng.uniform(9.6e4, 1.03e5, ncol),
        "pbuf_SOLIN": np.abs(rng.normal(800, 300, ncol)),
        "pbuf_LHFLX": np.abs(rng.normal(80, 30, ncol)),
        "pbuf_SHFLX": np.abs(rng.normal(25, 10, ncol)),
    }
    mli = dict(base)
    mlo = {k: v + rng.normal(0, 1e-3 * (np.abs(v).mean() + 1e-12), v.shape)
           for k, v in base.items()}
    for nm in ("cam_out_NETSW", "cam_out_FLWDS", "cam_out_PRECSC",
               "cam_out_PRECC", "cam_out_SOLS", "cam_out_SOLL",
               "cam_out_SOLSD", "cam_out_SOLLD"):
        mlo[nm] = np.abs(rng.normal(100, 40, ncol))
    for abbrev, d in (("mli", mli), ("mlo", mlo)):
        p = dirpath / f"E3SM-MMF.{abbrev}.{stamp}.nc"
        with h5py.File(p, "w") as f:
            for k, v in d.items():
                f.create_dataset(k, data=np.asarray(v, np.float64))
    return mli, mlo


def test_ingest_v1_end_to_end(tmp_path):
    grid = Grid.from_file(GRID_PATH)
    vset = V.get("v1")
    sub = tmp_path / "0001-02"
    sub.mkdir()
    pairs = [_write_pair(sub, f"0001-02-0{i}-00000", seed=i)
             for i in range(3)]

    fl = FileLists(str(tmp_path))
    fl.set_regexps("train", ["*/E3SM-MMF.mli.0001-*.nc"])
    fl.set_stride_sample("train", 1)

    out = str(tmp_path / "train.h5")
    n = ingest(fl, vset, grid, out, "train")
    assert n == 3 * 384

    r = KeeplevReader(out)
    assert r.varnames["input_lev"] == ["state_t", "state_q0001"]
    assert r.varnames["output_sca"][0] == "cam_out_NETSW"
    d = r.load_all()
    assert d["input_lev"].shape == (1152, 60, 2)
    assert d["input_sca"].shape == (1152, 4)
    assert d["output_lev"].shape == (1152, 60, 2)
    # tendency contract: ptend_t == (mlo - mli)/1200 for the first file
    mli0, mlo0 = pairs[0]
    exp = (mlo0["state_t"] - mli0["state_t"]) / 1200.0
    np.testing.assert_allclose(d["output_lev"][:384, :, 0], exp, rtol=1e-5)
    # input passthrough
    np.testing.assert_allclose(d["input_lev"][:384, :, 0],
                               mli0["state_t"], rtol=1e-6)


def test_ingest_derives_rh_for_v2rh(tmp_path):
    grid = Grid.from_file(GRID_PATH)
    vset = V.get("v2_rh")
    sub = tmp_path / "d"
    sub.mkdir()
    # v2_rh needs more raw fields; extend the writer output
    mli, _ = _write_pair(sub, "0001-02-00-00000", seed=5)
    extra = {"pbuf_TAUX": 384, "pbuf_TAUY": 384, "pbuf_COSZRS": 384,
             "cam_in_ALDIF": 384, "cam_in_ALDIR": 384, "cam_in_ASDIF": 384,
             "cam_in_ASDIR": 384, "cam_in_LWUP": 384, "cam_in_ICEFRAC": 384,
             "cam_in_LANDFRAC": 384, "cam_in_OCNFRAC": 384,
             "cam_in_SNOWHICE": 384, "cam_in_SNOWHLAND": 384}
    lev_extra = {"pbuf_ozone": (384, 60), "pbuf_CH4": (384, 60),
                 "pbuf_N2O": (384, 60)}
    rng = np.random.default_rng(0)
    for abbrev in ("mli", "mlo"):
        with h5py.File(sub / f"E3SM-MMF.{abbrev}.0001-02-00-00000.nc",
                       "a") as f:
            for k, n in extra.items():
                f.create_dataset(k, data=np.abs(rng.normal(0.3, 0.1, n)))
            for k, s in lev_extra.items():
                f.create_dataset(k, data=np.abs(rng.normal(1e-6, 1e-7, s)))

    fl = FileLists(str(tmp_path))
    fl.set_regexps("train", ["*/E3SM-MMF.mli.*.nc"])
    fl.set_stride_sample("train", 1)
    x_lev, x_sfc, y_lev, y_sfc = pack_pair(
        fl.get_filelist("train")[0],
        fl.output_path(fl.get_filelist("train")[0]), vset, grid)
    i_rh = vset.inputs.lev_names.index("state_rh")
    rh = x_lev[:, :, i_rh]
    assert np.isfinite(rh).all()
    assert rh.min() >= 0
    # spot-check the derivation against thermo directly
    from climsim_tpu.physics import thermo
    i_t = vset.inputs.lev_names.index("state_t")
    pmid = np.asarray(grid.mid_pressure(jnp.asarray(x_sfc[:, 0],
                                                    jnp.float64)))
    exp = np.asarray(thermo.specific_to_relative_humidity(
        jnp.asarray(mli["state_q0001"]), jnp.asarray(x_lev[:, :, i_t]),
        jnp.asarray(pmid)))
    # x_lev is stored float32; the recompute is float64
    np.testing.assert_allclose(rh, exp, rtol=5e-3)
    assert y_lev.shape == (384, 60, 6)


def test_save_as_npy_roundtrip(tmp_path):
    """save_as_npy flattens keeplev arrays to the registry flat contract
    (input/target npy + h5 twins + latlontime pickle)."""
    import pickle
    from climsim_tpu import variables as V
    from climsim_tpu.grid import Grid
    from climsim_tpu.data.ingest import save_as_npy, keeplev_to_flat

    vset = V.get("v1")
    g = Grid.from_file(
        "/root/reference/grid_info/ClimSim_low-res_grid-info.nc")
    T, B, L = 3, 384, 60
    rng = np.random.default_rng(0)
    inl, outl = vset.inputs, vset.outputs
    x_lev = rng.normal(0, 1, (T * B, L, inl.n_lev_vars)).astype(np.float32)
    x_sfc = rng.normal(0, 1, (T * B, inl.n_sfc_vars)).astype(np.float32)
    y_lev = rng.normal(0, 1, (T * B, L, outl.n_lev_vars)).astype(np.float32)
    y_sfc = rng.normal(0, 1, (T * B, outl.n_sfc_vars)).astype(np.float32)
    y_lev[0, 0, 0] = np.nan          # scrubbed to 0 like the reference
    save_as_npy((x_lev, x_sfc, y_lev, y_sfc), vset, str(tmp_path), "val",
                save_h5=True, grid=g, save_latlontime=True,
                dates=["0001-02-01-00000"] * T)
    x = np.load(tmp_path / "val_input.npy")
    y = np.load(tmp_path / "val_target.npy")
    assert x.shape == (T * B, vset.input_feature_len)
    assert y.shape == (T * B, vset.target_feature_len)
    # registry slices recover the original per-variable arrays
    for vi, name in enumerate(inl.lev_names):
        np.testing.assert_array_equal(x[:, inl.slices[name]],
                                      x_lev[..., vi])
    for vi, name in enumerate(inl.sfc_names):
        np.testing.assert_array_equal(x[:, inl.slices[name]].ravel(),
                                      x_sfc[..., vi])
    assert y[0, outl.slices[outl.lev_names[0]].start] == 0.0  # scrubbed
    import h5py
    with h5py.File(tmp_path / "val_input.h5") as f:
        np.testing.assert_array_equal(f["data"][:], x)
    with open(tmp_path / "val_indextolatlontime.pkl", "rb") as f:
        lt = pickle.load(f)
    assert lt[0][0] == (float(np.asarray(g.lat)[0]),
                        float(np.asarray(g.lon)[0]))
    assert lt[0][1] == "0001-02-01-00000"
    assert lt[B][1] == "0001-02-01-00000"
