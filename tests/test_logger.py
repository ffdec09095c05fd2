"""Observability: meters, cadence, log files, TB artifacts."""

import json
import os

import numpy as np

from maskcyclegan_vc_tpu.obs.logger import AverageMeter, TrainLogger


def test_average_meter():
    m = AverageMeter()
    m.update(2.0)
    m.update(4.0, n=3)
    assert m.avg == (2.0 + 12.0) / 4
    m.reset()
    assert m.count == 0


def test_train_logger_files(tmp_path):
    lg = TrainLogger(str(tmp_path), "run1", steps_per_print=2,
                     config={"seed": 0, "batch_size": 4})
    for step in range(1, 5):
        lg.log_iter(step, 1, {"g_loss": float(step), "d_loss": 0.5}, batch_size=4)
    lg.log_spectrogram("spec", np.random.randn(80, 64), 1)
    lg.log_audio("aud", np.random.randn(1000) * 0.1, 1)
    lg.close()

    run = tmp_path / "run1"
    assert (run / "train_args.json").exists()
    with open(run / "train_args.json") as f:
        assert json.load(f)["batch_size"] == 4
    log = (run / "run1.log").read_text()
    assert "g_loss" in log and "step 2" in log and "step 4" in log
    # TB event files written
    logs_dir = tmp_path / "logs"
    assert any(p.startswith("run1_") for p in os.listdir(logs_dir))
