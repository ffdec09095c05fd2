"""End-to-end waveform output through a weight-normed torch MelGAN ckpt.

Closes the reference's full test flow (/root/reference/mask_cyclegan_vc/
test.py:99-103): a *real* torch state_dict — weight_norm (g, v) pairs
under the published ``model.N`` Sequential key layout, full-size
architecture (80 mels, ngf 32, 3 resblocks, ratios 8,8,2,2) — is saved
to disk, handed to ``cli.test --vocoder_ckpt``, and must produce sane
converted + original wavs on disk. Also pins decode parity of that
checkpoint layout against the torch forward.
"""

import glob
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from maskcyclegan_vc_tpu.data.audio_io import read_wav, write_wav  # noqa: E402
from test_melgan import build_torch_melgan  # noqa: E402


@pytest.fixture(scope="module")
def melgan_ckpt(tmp_path_factory):
    """Full-size melgan-neurips state_dict: weight_norm'd, model.N keys."""
    torch.manual_seed(7)
    ref = build_torch_melgan(n_mels=80, ngf=32, n_res=3)
    ref.eval()
    sd = {f"model.{k}": v for k, v in ref.state_dict().items()}
    assert any(k.endswith(".weight_g") for k in sd), "oracle must be weight-normed"
    path = tmp_path_factory.mktemp("melgan") / "melgan_vocoder.pt"
    torch.save(sd, str(path))
    return str(path), ref


@pytest.fixture(scope="module")
def trained_run(tmp_path_factory):
    """Tiny corpus -> preprocess CLI -> 1-epoch train CLI -> checkpoint."""
    from maskcyclegan_vc_tpu.cli.preprocess import main as pre_main
    from maskcyclegan_vc_tpu.cli.train import main as train_main

    root = tmp_path_factory.mktemp("vocoder_e2e")
    rs = np.random.RandomState(0)
    for sid, f0 in (("VCC2SF3", 220.0), ("VCC2TF1", 330.0)):
        d = root / "wavs" / sid
        d.mkdir(parents=True)
        for i in range(2):
            n = 22050 + 1000 * i
            t = np.arange(n) / 22050.0
            x = 0.4 * np.sin(2 * np.pi * (f0 + 7 * i) * t)
            x += 0.02 * rs.randn(n)
            write_wav(str(d / f"{i}.wav"), x.astype(np.float32), 22050)
    pre = str(root / "preprocessed")
    pre_main([
        "--data_directory", str(root / "wavs"),
        "--preprocessed_data_directory", pre,
        "--speaker_ids", "VCC2SF3", "VCC2TF1",
    ])
    save = str(root / "results")
    train_main([
        "--name", "voc_e2e",
        "--save_dir", save,
        "--preprocessed_data_dir", pre,
        "--num_epochs", "1",
        "--batch_size", "1",
        "--residual_channels", "8",
        "--epochs_per_save", "1",
        "--epochs_per_plot", "1000",
    ])
    return pre, save


def test_vocoder_wav_branch_e2e(trained_run, melgan_ckpt):
    from maskcyclegan_vc_tpu.cli.test import main as test_main

    pre, save = trained_run
    ckpt_path, _ = melgan_ckpt
    test_main([
        "--name", "voc_e2e",
        "--save_dir", save,
        "--preprocessed_data_dir", pre,
        "--ckpt_dir", os.path.join(save, "voc_e2e", "ckpts"),
        "--load_epoch", "1",
        "--model_name", "generator_A2B",
        "--residual_channels", "8",
        "--vocoder_ckpt", ckpt_path,
    ])
    out_dir = os.path.join(save, "voc_e2e", "converted_audio_1")
    converted = sorted(glob.glob(os.path.join(out_dir, "*-converted_*.wav")))
    originals = sorted(glob.glob(os.path.join(out_dir, "*-original_*.wav")))
    assert len(converted) == 2 and len(originals) == 2

    from maskcyclegan_vc_tpu.data.dataset import load_speaker

    src_mels, _, _ = load_speaker(pre, "VCC2SF3")
    for i, path in enumerate(converted):
        wav, sr = read_wav(path)
        assert sr == 22050
        # MelGAN output length contract: T mel frames -> T*256 samples.
        assert wav.shape == (src_mels[i].shape[1] * 256,)
        assert np.isfinite(wav).all()
        assert np.abs(wav).max() <= 1.0 + 1e-4  # tanh output
        assert wav.std() > 1e-5  # not silence


def test_published_key_layout_decode_parity(melgan_ckpt):
    """decode through our converter == the torch forward, full-size model."""
    from maskcyclegan_vc_tpu.models.melgan import (
        MelGANGenerator,
        melgan_params_from_torch,
    )

    ckpt_path, ref = melgan_ckpt
    sd = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    params = melgan_params_from_torch(sd)
    gen = MelGANGenerator(precision="highest")

    rs = np.random.RandomState(3)
    mel = rs.randn(1, 80, 11).astype(np.float32)
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(mel)).numpy()[:, 0]
    jparams = {"params": {k: jnp.asarray(v) for k, v in params["params"].items()}}
    y = np.asarray(gen.apply(jparams, jnp.asarray(mel)))
    assert y.shape == (1, 11 * 256)
    np.testing.assert_allclose(y, y_ref, atol=3e-5)
