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
