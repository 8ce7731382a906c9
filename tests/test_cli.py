"""CLI smoke tests: every entry point runs end-to-end on tiny configs."""
import json
import subprocess
import sys
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, timeout=360):
    return subprocess.run([sys.executable, "-m"] + args, cwd=REPO,
                          capture_output=True, text=True, timeout=timeout)


def test_train_offline_cli(tmp_path):
    r = _run(["climsim_tpu.cli.train_offline", "conf/mlp_v1.yaml",
              "platform=cpu", "epochs=2", "data.steps=6",
              "model.features=[32,32]",
              f"metrics_csv={tmp_path}/m.csv"])
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [l for l in r.stdout.splitlines() if l.startswith("{")]
    assert len(lines) == 2
    assert "ptend_t" in r.stdout
    assert os.path.exists(tmp_path / "m.csv")


def test_train_rollout_cli(tmp_path):
    r = _run(["climsim_tpu.cli.train_rollout", "conf/autoreg_gru.yaml",
              "platform=cpu", "epochs=2", "data.steps=8",
              "model.nneur=[24,24]", f"log_path={tmp_path}/log.jsonl"])
    assert r.returncode == 0, r.stderr[-2000:]
    recs = [json.loads(l) for l in open(tmp_path / "log.jsonl")]
    assert len(recs) == 2
    assert np.isfinite(recs[-1]["loss"])


def test_run_hybrid_cli(tmp_path):
    r = _run(["climsim_tpu.cli.run_hybrid", "--steps", "4",
              "--platform", "cpu", "--nneur", "32",
              "--out", str(tmp_path / "d.npz")])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "finite: True" in r.stdout
    d = np.load(tmp_path / "d.npz")
    assert d["mean_T"].shape == (4,)


def test_scale_bench_cli():
    r = _run(["climsim_tpu.cli.scale_bench", "--devices", "1", "2",
              "--platform", "cpu", "--steps", "2", "--nlat", "16",
              "--nlon", "24"])
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [json.loads(l) for l in r.stdout.splitlines()
             if l.startswith("{")]
    assert len(lines) == 2 and lines[0]["devices"] == 1


def test_train_classifier_gradout_cli(tmp_path):
    """classifier_gradout = the v5 cloud classifier trainer with gradient
    clipping + per-minibatch gradient observability and checkpoint
    restart (train_unet_h5loader_classifier_gradout.py:301-406)."""
    common = ["climsim_tpu.cli.train_offline", "conf/mlp_v1.yaml",
              "platform=cpu", "vset=v5", "epochs=2", "data.steps=8",
              "batch_size=384", "model.name=classifier_gradout",
              "model.model_channels=16", "model.num_blocks=1",
              "optimizer.max_grad_norm=1.0"]
    r = _run(common + [f"checkpoint_dir={tmp_path}"])
    assert r.returncode == 0, r.stderr[-2000:]
    recs = [json.loads(l) for l in r.stdout.splitlines()
            if l.startswith("{")]
    eps = [rec for rec in recs if "train_ce" in rec]
    assert len(eps) == 2
    assert all("max_grad" in rec and "total_norm" in rec for rec in eps)
    assert eps[1]["train_ce"] < eps[0]["train_ce"]
    assert recs[-1]["val_accuracy"] > 0
    assert os.path.isdir(tmp_path / "classifier")

    # restart from the saved classifier checkpoint (frozen restore path)
    r2 = _run(common + [f"init_from={tmp_path}/classifier", "epochs=1"])
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "init_from: loaded" in r2.stdout
    recs2 = [json.loads(l) for l in r2.stdout.splitlines()
             if l.startswith("{")]
    first2 = next(rec for rec in recs2 if "train_ce" in rec)
    # restart resumes near the donor's trained loss, below a cold start
    assert first2["train_ce"] < eps[0]["train_ce"]


def test_train_rollout_cli_reference_norm(tmp_path):
    """The shipped reference-normalization conf trains end-to-end: the
    CLI loads input_{mean,max,min}_v4_pervar.nc +
    output_scale_std_lowerthred_v5.nc + the qc/qi exp-lambda txts
    (data.norm=reference) instead of fitting stats from the data."""
    r = _run(["climsim_tpu.cli.train_rollout",
              "conf/autoreg_gru_refnorm.yaml",
              "platform=cpu", "epochs=2", "data.steps=8",
              "model.nneur=[24,24]", f"log_path={tmp_path}/log.jsonl"])
    assert r.returncode == 0, r.stderr[-2000:]
    recs = [json.loads(l) for l in open(tmp_path / "log.jsonl")]
    assert len(recs) == 2
    assert np.isfinite(recs[-1]["loss"])


def test_reference_norm_assembly_matches_driver():
    """reference_level_normalizer reproduces the reference driver's
    coefficient assembly (train_rnn_rollout_torchscript_hydra.py:323-456)
    against hand-read file values: per-level mean/(max-min), the CH4/N2O
    zero-division fix, and the SNOWHICE neutralization."""
    sys.path.insert(0, REPO)
    from climsim_tpu import variables as V
    from climsim_tpu.data.normalization import (reference_level_normalizer,
                                                read_netcdf, REF_NORM_DIR)
    vset = V.get("v4_rnn")
    nz = reference_level_normalizer(vset)
    mean = read_netcdf(f"{REF_NORM_DIR}/inputs/input_mean_v4_pervar.nc")
    maxv = read_netcdf(f"{REF_NORM_DIR}/inputs/input_max_v4_pervar.nc")
    minv = read_netcdf(f"{REF_NORM_DIR}/inputs/input_min_v4_pervar.nc")
    scal = read_netcdf(
        f"{REF_NORM_DIR}/outputs/output_scale_std_lowerthred_v5.nc")
    # plain per-level channel (state_t, idx 0)
    np.testing.assert_allclose(np.asarray(nz.mean_lev)[:, 0],
                               np.asarray(mean["state_t"], np.float32))
    np.testing.assert_allclose(
        np.asarray(nz.div_lev)[:, 0],
        np.asarray(maxv["state_t"] - minv["state_t"], np.float32),
        rtol=1e-6)
    # CH4/N2O zero-division fix: divs strictly positive, zeros replaced by
    # the channel's minimum positive div (driver :410-421)
    for name in ("pbuf_CH4", "pbuf_N2O"):
        j = vset.inputs.lev_names.index(name)
        div_raw = np.asarray(maxv[name] - minv[name])
        div = np.asarray(nz.div_lev)[:, j]
        assert (div_raw == 0.0).any()          # the files DO have zeros
        assert (div > 0.0).all()
        np.testing.assert_allclose(div[div_raw == 0.0],
                                   div_raw[div_raw > 0.0].min(), rtol=1e-6)
        np.testing.assert_allclose(div[div_raw > 0.0],
                                   div_raw[div_raw > 0.0], rtol=1e-6)
    # SNOWHICE neutralized (driver :452-455)
    i = vset.inputs.sfc_names.index("cam_in_SNOWHICE")
    assert float(nz.mean_sfc[i]) == 0.0 and float(nz.div_sfc[i]) == 1.0
    # output scales straight from the driver's actual file (:137),
    # output_scale_std_lowerthred_v5.nc
    np.testing.assert_allclose(np.asarray(nz.scale_lev)[:, 0],
                               np.asarray(scal["ptend_t"], np.float32))
    # cloud channels carry the identity normalization (the exp transform
    # is their normalization): mean 0, div 1
    for name in ("state_q0002", "state_q0003"):
        j = vset.inputs.lev_names.index(name)
        np.testing.assert_allclose(np.asarray(nz.mean_lev)[:, j], 0.0)
        np.testing.assert_allclose(np.asarray(nz.div_lev)[:, j], 1.0)
