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
