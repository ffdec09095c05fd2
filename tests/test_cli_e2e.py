"""End-to-end pipeline: synth wavs -> preprocess -> train -> convert.

Exercises the real CLIs on a small model (R=8) with true 80-bin mels, on
the CPU test platform. This is the framework's "minimum end-to-end
slice" (SURVEY §7.2) as an automated test.
"""

import glob
import json
import os

import numpy as np
import pytest

from maskcyclegan_vc_tpu.data.audio_io import write_wav


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """Two tiny synthetic speakers, 3 utterances each (~1s, 22050 Hz)."""
    root = tmp_path_factory.mktemp("vcc")
    rs = np.random.RandomState(0)
    for sid, f0 in (("VCC2SF3", 220.0), ("VCC2TF1", 330.0)):
        d = root / "wavs" / sid
        d.mkdir(parents=True)
        for i in range(3):
            n = 22050 + 2000 * i
            t = np.arange(n) / 22050.0
            x = 0.4 * np.sin(2 * np.pi * (f0 + 5 * i) * t)
            x = x * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t))  # AM envelope
            x += 0.02 * rs.randn(n)
            write_wav(str(d / f"{i}.wav"), x.astype(np.float32), 22050)
    return root


def test_preprocess_cli(corpus):
    from maskcyclegan_vc_tpu.cli.preprocess import main

    out = str(corpus / "preprocessed")
    main([
        "--data_directory", str(corpus / "wavs"),
        "--preprocessed_data_directory", out,
        "--speaker_ids", "VCC2SF3", "VCC2TF1",
    ])
    for sid in ("VCC2SF3", "VCC2TF1"):
        assert os.path.exists(os.path.join(out, sid, f"{sid}_normalized.pickle"))
        assert os.path.exists(os.path.join(out, sid, f"{sid}_norm_stat.npz"))

    from maskcyclegan_vc_tpu.data.dataset import load_speaker

    mels, mean, std = load_speaker(out, "VCC2SF3")
    assert len(mels) == 3
    assert mels[0].shape[0] == 80
    # ~1s at hop 256 with 3-frame pad gain: T = (L + 768 - 1024)//256 + 1
    assert 80 <= mels[0].shape[1] <= 90


def test_train_and_convert_cli(corpus, capsys):
    from maskcyclegan_vc_tpu.cli.train import main as train_main
    from maskcyclegan_vc_tpu.cli.test import main as test_main

    pre = str(corpus / "preprocessed")
    if not os.path.exists(os.path.join(pre, "VCC2SF3")):
        pytest.skip("preprocess test must run first")
    save = str(corpus / "results")

    train_main([
        "--name", "e2e",
        "--save_dir", save,
        "--preprocessed_data_dir", pre,
        "--num_epochs", "2",
        "--batch_size", "1",
        "--num_frames", "64",
        "--residual_channels", "8",
        "--epochs_per_save", "2",
        "--epochs_per_plot", "1000",  # skip plotting in the test
        "--steps_per_print", "1",
    ])
    ckpts = glob.glob(os.path.join(save, "e2e", "ckpts", "*_state.npz"))
    assert len(ckpts) == 1
    assert os.path.exists(os.path.join(save, "e2e", "train_args.json"))
    with open(os.path.join(save, "e2e", "train_args.json")) as f:
        snap = json.load(f)
    assert snap["residual_channels"] == 8

    test_main([
        "--name", "e2e",
        "--save_dir", save,
        "--preprocessed_data_dir", pre,
        "--ckpt_dir", os.path.join(save, "e2e", "ckpts"),
        "--load_epoch", "2",
        "--model_name", "generator_A2B",
        "--residual_channels", "8",
        "--compute_mcd",
    ])
    outs = glob.glob(os.path.join(save, "e2e", "converted_audio_2", "*-converted_*.npy"))
    assert len(outs) == 3
    mel = np.load(outs[0])
    assert mel.shape[0] == 80 and np.isfinite(mel).all()
    # Objective eval: DTW-MCD vs the index-paired target utterances.
    mcd_line = [l for l in capsys.readouterr().out.splitlines()
                if l.startswith("MCD(log-mel-DCT) ")]
    assert len(mcd_line) == 1 and "(n=3)" in mcd_line[0]
    assert np.isfinite(float(mcd_line[0].split()[1]))


def test_resume_continues(corpus):
    from maskcyclegan_vc_tpu.cli.train import main as train_main
    from maskcyclegan_vc_tpu.io.checkpoint import latest_epoch

    pre = str(corpus / "preprocessed")
    save = str(corpus / "results")
    if not os.path.exists(os.path.join(save, "e2e", "ckpts")):
        pytest.skip("train test must run first")
    train_main([
        "--name", "e2e",
        "--save_dir", save,
        "--preprocessed_data_dir", pre,
        "--num_epochs", "4",
        "--batch_size", "1",
        "--residual_channels", "8",
        "--epochs_per_save", "2",
        "--epochs_per_plot", "1000",
        "--continue_train",
    ])
    assert latest_epoch(os.path.join(save, "e2e", "ckpts")) == 4
