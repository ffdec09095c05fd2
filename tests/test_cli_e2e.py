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

    # The CLI computed the stats with the COLLECTIVE path (8 devices are
    # visible here — cli/preprocess.py auto-selects psum stats); they
    # must match the reference's numpy pass bit-for-tolerance. Denorm
    # the saved pickles back and recompute the numpy oracle.
    import jax

    assert len(jax.devices()) > 1  # precondition for the auto-selection
    from maskcyclegan_vc_tpu.data.dataset import compute_norm_stats

    raw = [m * std + mean for m in mels]
    np_mean, np_std = compute_norm_stats(raw)
    np.testing.assert_allclose(mean, np_mean, atol=1e-4)
    np.testing.assert_allclose(std, np_std, atol=1e-4)


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
    # Full metric decomposition reaches the .log (scan-epoch path).
    with open(os.path.join(save, "e2e", "e2e.log")) as f:
        log = f.read()
    for k in ("g_loss", "d_loss", "g_adv_loss", "g_cycle_loss",
              "g_identity_loss", "d_loss_first", "d_loss_second"):
        assert f"{k}:" in log, k
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


def test_train_cli_sync_save_path(corpus):
    """--async_save 0 forces the synchronous save branch; checkpoints
    and rotation behave identically (the default e2e runs cover the
    async branch)."""
    from maskcyclegan_vc_tpu.cli.train import main as train_main

    pre = str(corpus / "preprocessed")
    if not os.path.exists(os.path.join(pre, "VCC2SF3")):
        pytest.skip("preprocess test must run first")
    save = str(corpus / "results")
    train_main([
        "--name", "e2e_sync",
        "--save_dir", save,
        "--preprocessed_data_dir", pre,
        "--num_epochs", "2",
        "--batch_size", "1",
        "--num_frames", "64",
        "--residual_channels", "8",
        "--epochs_per_save", "1",
        "--epochs_per_plot", "1000",
        "--steps_per_print", "1",
        "--async_save", "0",
        "--max_ckpts", "1",
    ])
    ckpts = sorted(glob.glob(os.path.join(save, "e2e_sync", "ckpts",
                                          "*_state.npz")))
    # Rotation ran synchronously too: only the newest survives.
    assert [os.path.basename(c) for c in ckpts] == ["00002_state.npz"]


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
        "--steps_per_print", "1",
        "--scan_epochs", "0",  # resume through the host-loop path
        "--continue_train",
    ])
    assert latest_epoch(os.path.join(save, "e2e", "ckpts")) == 4
    # Full metric decomposition also reaches the .log on the host-loop path.
    with open(os.path.join(save, "e2e", "e2e.log")) as f:
        log = f.read()
    assert "g_cycle_loss:" in log and "d_loss_second:" in log


def test_plot_rotates_validation_utterances():
    """Successive plot epochs show different utterances (reference walks
    its validation_dataloader, train.py:317-358)."""
    import types

    from maskcyclegan_vc_tpu.train.trainer import Trainer, TrainerArgs

    recorded = []
    stub = types.SimpleNamespace(
        args=TrainerArgs(epochs_per_plot=2, plot_audio="off"),
        mels_A=[np.full((80, 70), i, np.float32) for i in range(3)],
        mels_B=[np.full((80, 70), 10 + i, np.float32) for i in range(2)],
        _convert=lambda mel, d: mel,
        _vocoder=None,
        logger=types.SimpleNamespace(
            log_spectrogram_grid=lambda m, e: recorded.append(
                (float(m["real_A_spec"][0, 0]), float(m["real_B_spec"][0, 0]))),
            log_spectrogram=lambda *a, **k: None),
    )
    for epoch in (2, 4, 6, 8):
        Trainer._plot(stub, epoch)
    assert [a for a, _ in recorded] == [0.0, 1.0, 2.0, 0.0]
    assert [b for _, b in recorded] == [10.0, 11.0, 10.0, 11.0]


def test_train_cli_options_dump_and_validation_flag():
    """--num_frames_validation is accepted (and intentionally ignored,
    reference quirk A.9) and the startup dump lists every resolved flag
    in the reference's print_options format (base_arg_parser.py:147-163)."""
    from maskcyclegan_vc_tpu.cli.train import build_parser, print_options

    args = build_parser().parse_args(
        ["--name", "x", "--num_frames_validation", "128"])
    assert args.num_frames_validation == 128
    dump = print_options(args)
    assert dump.startswith("----------------- Options ---------------")
    assert dump.rstrip().endswith("----------------- End -------------------")
    for key in ("batch_size", "num_frames_validation", "decay_after", "name"):
        assert key in dump


def test_train_cli_grad_allreduce_flag_wiring():
    """--grad_allreduce_dtype reaches the trainer args and resolves the
    compression predicate: float32 (default) keeps the GSPMD path,
    bfloat16 selects the explicit shard_map path."""
    import dataclasses

    from maskcyclegan_vc_tpu.cli.train import build_parser
    from maskcyclegan_vc_tpu.train.trainer import TrainerArgs

    for flagv, compress in (("float32", False), ("bfloat16", True)):
        args = build_parser().parse_args(
            ["--name", "x", "--grad_allreduce_dtype", flagv])
        targs = TrainerArgs(**{
            f.name: getattr(args, f.name)
            for f in dataclasses.fields(TrainerArgs)
        })
        assert targs.grad_allreduce_dtype == flagv
        # Same predicate Trainer.__init__ evaluates.
        assert (targs.grad_allreduce_dtype not in
                (None, "", "float32", "f32")) is compress


def test_plot_with_griffin_lim_audio(corpus):
    """Plot cadence without a vocoder checkpoint: spectrogram figures plus
    Griffin-Lim TB audio (the reference always decodes audio at plot
    epochs, train.py:332-358 — our vocoder-free fallback keeps that
    surface populated) and a GL-decoded conversion wav from the CLI."""
    from maskcyclegan_vc_tpu.cli.test import main as test_main
    from maskcyclegan_vc_tpu.cli.train import main as train_main

    pre = str(corpus / "preprocessed")
    if not os.path.exists(os.path.join(pre, "VCC2SF3")):
        pytest.skip("preprocess test must run first")
    save = str(corpus / "results")
    train_main([
        "--name", "e2e_plot",
        "--save_dir", save,
        "--preprocessed_data_dir", pre,
        "--num_epochs", "1",
        "--batch_size", "1",
        "--num_frames", "64",
        "--residual_channels", "8",
        "--epochs_per_save", "1",
        "--epochs_per_plot", "1",  # plot (figures + GL audio) at epoch 1
        "--steps_per_print", "1",
    ])
    assert os.path.exists(os.path.join(save, "e2e_plot", "ckpts",
                                       "00001_state.npz"))

    test_main([
        "--name", "e2e_plot",
        "--save_dir", save,
        "--preprocessed_data_dir", pre,
        "--ckpt_dir", os.path.join(save, "e2e_plot", "ckpts"),
        "--load_epoch", "1",
        "--model_name", "generator_A2B",
        "--residual_channels", "8",
        "--griffin_lim", "--griffin_lim_iters", "8",
    ])
    wavs = glob.glob(os.path.join(save, "e2e_plot", "converted_audio_1",
                                  "*-converted_*.wav"))
    assert len(wavs) == 3
    from maskcyclegan_vc_tpu.data.audio_io import load_audio

    w = load_audio(wavs[0], target_sr=22050)
    assert np.isfinite(w).all() and 0 < np.abs(w).max() <= 1.0


def test_compute_mcd_reports_f0(corpus, capsys):
    """--compute_mcd also prints the F0 register report (absolute,
    comparable complement to the relative log-mel-DCT MCD)."""
    from maskcyclegan_vc_tpu.cli.test import main as test_main

    pre = str(corpus / "preprocessed")
    save = str(corpus / "results")
    if not os.path.exists(os.path.join(save, "e2e", "ckpts")):
        pytest.skip("train test must run first")
    test_main([
        "--name", "e2e",
        "--save_dir", save,
        "--preprocessed_data_dir", pre,
        "--ckpt_dir", os.path.join(save, "e2e", "ckpts"),
        "--load_epoch", "2",
        "--model_name", "generator_B2A",
        "--residual_channels", "8",
        "--compute_mcd",
    ])
    out = capsys.readouterr().out
    f0_line = [l for l in out.splitlines() if l.startswith("F0 median: ")]
    assert len(f0_line) == 1
    # source/converted/target registers all parse as finite Hz values
    nums = [float(tok) for tok in f0_line[0].replace("(", " ").split()
            if tok.replace(".", "").isdigit()]
    assert len(nums) == 3 and all(np.isfinite(n) and n > 0 for n in nums)
    # Without a waveform decoder there is no warped-cepstral wav MCD.
    assert "MCD(warped-cepstral, wav)" not in out


def test_compute_mcd_wav_with_griffin_lim(corpus, capsys):
    """With a waveform decoder active, --compute_mcd additionally reports
    the published-convention warped-cepstral MCD on the decoded wavs
    (eval/mcep.py), both sides through the same decoder."""
    from maskcyclegan_vc_tpu.cli.test import main as test_main

    pre = str(corpus / "preprocessed")
    save = str(corpus / "results")
    if not os.path.exists(os.path.join(save, "e2e", "ckpts")):
        pytest.skip("train test must run first")
    test_main([
        "--name", "e2e",
        "--save_dir", save,
        "--preprocessed_data_dir", pre,
        "--ckpt_dir", os.path.join(save, "e2e", "ckpts"),
        "--load_epoch", "2",
        "--model_name", "generator_A2B",
        "--residual_channels", "8",
        "--compute_mcd",
        "--griffin_lim", "--griffin_lim_iters", "4",
    ])
    out = capsys.readouterr().out
    line = [l for l in out.splitlines()
            if l.startswith("MCD(warped-cepstral, wav)")]
    assert len(line) == 1, out
    val = float(line[0].split()[2])
    assert np.isfinite(val) and val > 0
