"""Data layer: mel frontend parity vs torch.stft, WAV IO, device sampler."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maskcyclegan_vc_tpu.data.audio_io import load_audio, read_wav, resample, write_wav
from maskcyclegan_vc_tpu.data.dataset import (
    MelBank,
    compute_norm_stats,
    load_speaker,
    normalize,
    sample_batch,
    save_speaker,
)
from maskcyclegan_vc_tpu.data.melspec import (
    HOP_LENGTH,
    N_FFT,
    N_MELS,
    hann_window_periodic,
    log_mel_spectrogram,
    mel_filterbank,
)


# ---------- mel frontend ----------

def torch_audio2mel(audio: np.ndarray) -> np.ndarray:
    """Oracle: the melgan-neurips Audio2Mel pipeline re-expressed with
    torch.stft + our filterbank (librosa is unavailable; the torch STFT is
    the reference's actual compute substrate via torch.hub)."""
    import torch

    x = torch.from_numpy(audio)[None]
    p = (N_FFT - HOP_LENGTH) // 2
    x = torch.nn.functional.pad(x[None], (p, p), "reflect")[0]
    win = torch.from_numpy(hann_window_periodic())
    fft = torch.stft(
        x, N_FFT, HOP_LENGTH, N_FFT, window=win, center=False,
        return_complex=True,
    )
    mag = fft.abs()
    basis = torch.from_numpy(mel_filterbank())
    mel = torch.matmul(basis, mag[0])
    return torch.log10(torch.clamp(mel, min=1e-5)).numpy()


@pytest.fixture(scope="module")
def test_tone():
    rs = np.random.RandomState(0)
    t = np.arange(22050 * 2) / 22050.0
    x = 0.5 * np.sin(2 * np.pi * 440 * t) + 0.1 * rs.randn(t.size)
    return x.astype(np.float32)


def test_log_mel_matches_torch_stft(test_tone):
    ref = torch_audio2mel(test_tone)
    ours = np.asarray(log_mel_spectrogram(jnp.asarray(test_tone)[None])[0])
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_log_mel_fft_path(test_tone):
    """Matmul-DFT path == jnp.fft path."""
    a = np.asarray(log_mel_spectrogram(jnp.asarray(test_tone)[None], use_fft=False))
    b = np.asarray(log_mel_spectrogram(jnp.asarray(test_tone)[None], use_fft=True))
    np.testing.assert_allclose(a, b, atol=2e-4)


def test_mel_filterbank_properties():
    fb = mel_filterbank()
    assert fb.shape == (N_MELS, N_FFT // 2 + 1)
    assert (fb >= 0).all()
    # every filter has support, and DC bin is (near) empty
    assert (fb.sum(axis=1) > 0).all()
    assert fb[:, 0].max() == 0.0
    # Slaney normalization: unit-peak triangle area (hi-lo)/2 scaled by
    # 2/(hi-lo) => each row integrates (over Hz) to ~1
    df = 22050 / 2 / (N_FFT // 2)
    areas = fb.sum(axis=1) * df
    assert np.all(areas > 0.9) and np.all(areas < 1.1)


def test_frame_count_contract(test_tone):
    """Audio2Mel frame count: with p=(n_fft-hop)/2 reflect pad and
    center=False, T = floor((L + 2p - n_fft)/hop) + 1."""
    L = test_tone.size
    p = (N_FFT - HOP_LENGTH) // 2
    expect_t = (L + 2 * p - N_FFT) // HOP_LENGTH + 1
    out = log_mel_spectrogram(jnp.asarray(test_tone)[None])
    assert out.shape == (1, N_MELS, expect_t)


# ---------- WAV IO ----------

def test_wav_roundtrip(tmp_path):
    rs = np.random.RandomState(1)
    x = np.clip(rs.randn(22050) * 0.2, -1, 1).astype(np.float32)
    path = str(tmp_path / "t.wav")
    write_wav(path, x, 22050)
    y, sr = read_wav(path)
    assert sr == 22050
    np.testing.assert_allclose(x, y, rtol=0, atol=1.0 / 16000)


def test_load_audio_resamples(tmp_path):
    t = np.arange(16000) / 16000.0
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    path = str(tmp_path / "t16k.wav")
    write_wav(path, x, 16000)
    y = load_audio(path, target_sr=22050)
    assert abs(y.size - 22050) < 10
    # the 440 Hz tone must survive resampling
    spec = np.abs(np.fft.rfft(y * np.hanning(y.size)))
    peak_hz = np.argmax(spec) * 22050 / y.size
    assert abs(peak_hz - 440) < 5


# ---------- sampler ----------

def make_bank(n=5, m=80, tmin=70, tmax=200, seed=0):
    rs = np.random.RandomState(seed)
    mels = [rs.randn(m, rs.randint(tmin, tmax)).astype(np.float32) for _ in range(n)]
    return MelBank.from_list(mels), mels


def test_melbank_drops_short():
    rs = np.random.RandomState(2)
    mels = [rs.randn(80, 100), rs.randn(80, 10), rs.randn(80, 64)]
    bank = MelBank.from_list([m.astype(np.float32) for m in mels], min_frames=64)
    assert len(bank) == 2


def test_sample_batch_shapes_and_masks():
    bank, _ = make_bank()
    batch = sample_batch(jax.random.PRNGKey(0), bank, bank, 4, 64, 25)
    for k in ("real_A", "mask_A", "real_B", "mask_B"):
        assert batch[k].shape == (4, 80, 64)
    for mk in ("mask_A", "mask_B"):
        m = np.asarray(batch[mk])
        assert set(np.unique(m)).issubset({0.0, 1.0})
        # mask is constant across mel bins (vc_dataset.py:55 zeroes all bins)
        assert (m == m[:, :1, :]).all()
        # hole length < max_mask_len
        holes = (m[:, 0, :] == 0).sum(axis=1)
        assert (holes < 25).all()


def test_sample_batch_deterministic_and_varied():
    bank, _ = make_bank()
    b1 = sample_batch(jax.random.PRNGKey(7), bank, bank, 4, 64, 25)
    b2 = sample_batch(jax.random.PRNGKey(7), bank, bank, 4, 64, 25)
    b3 = sample_batch(jax.random.PRNGKey(8), bank, bank, 4, 64, 25)
    np.testing.assert_array_equal(np.asarray(b1["real_A"]), np.asarray(b2["real_A"]))
    assert not np.allclose(np.asarray(b1["real_A"]), np.asarray(b3["real_A"]))


def test_crops_are_real_slices():
    bank, mels = make_bank(n=3)
    batch = sample_batch(jax.random.PRNGKey(3), bank, bank, 8, 64, 25)
    crops = np.asarray(batch["real_A"])
    data = np.asarray(bank.data)
    lens = np.asarray(bank.lengths)
    for b in range(crops.shape[0]):
        found = False
        for u in range(data.shape[0]):
            for s in range(lens[u] - 64 + 1):
                if np.array_equal(crops[b], data[u, :, s : s + 64]):
                    found = True
                    break
            if found:
                break
        assert found, f"crop {b} is not a contiguous slice of any utterance"


def test_mask_sizes_cover_range():
    """mask_size ~ U{0..max_mask_len-1} — both 0 and large sizes occur."""
    bank, _ = make_bank()
    sizes = []
    for i in range(20):
        b = sample_batch(jax.random.PRNGKey(i), bank, bank, 8, 64, 25)
        sizes.extend((np.asarray(b["mask_A"])[:, 0, :] == 0).sum(axis=1).tolist())
    sizes = np.asarray(sizes)
    assert sizes.min() == 0 and sizes.max() >= 20


# ---------- stats + disk format ----------

def test_norm_stats_and_roundtrip(tmp_path):
    _, mels = make_bank(n=4)
    mean, std = compute_norm_stats(mels)
    assert mean.shape == (80, 1) and std.shape == (80, 1)
    normed = normalize(mels, mean, std)
    cat = np.concatenate(normed, axis=1)
    np.testing.assert_allclose(cat.mean(axis=1), 0.0, atol=1e-4)
    np.testing.assert_allclose(cat.std(axis=1), 1.0, atol=1e-3)

    save_speaker(str(tmp_path), "VCC2SF3", normed, mean, std)
    mels2, mean2, std2 = load_speaker(str(tmp_path), "VCC2SF3")
    assert len(mels2) == len(normed)
    np.testing.assert_array_equal(mean, mean2)
    for a, b in zip(normed, mels2):
        np.testing.assert_array_equal(a, b)


# ---------- golden frontend fixtures ----------

def test_mel_filterbank_matches_golden_fixture():
    """Filterbank pinned against tests/fixtures/melfb_golden.npz — generated
    by an independent transcription of the librosa-0.8.0 algorithm
    (np.interp triangles; see tests/fixtures/gen_melfb_golden.py).
    Bitwise at generation time; any numerics drift fails here."""
    import os

    from maskcyclegan_vc_tpu.data.melspec import mel_filterbank

    z = np.load(os.path.join(os.path.dirname(__file__), "fixtures",
                             "melfb_golden.npz"))
    np.testing.assert_array_equal(mel_filterbank(), z["melfb"])


def test_log_mel_matches_golden_fixture():
    """Full frontend (both the matmul-DFT and the rfft paths) vs the
    float64 np.fft golden log-mels of a fixed signal."""
    import os

    from maskcyclegan_vc_tpu.data.melspec import log_mel_spectrogram

    z = np.load(os.path.join(os.path.dirname(__file__), "fixtures",
                             "melfb_golden.npz"))
    audio = jnp.asarray(z["audio"])[None]
    for use_fft in (False, True):
        got = np.asarray(log_mel_spectrogram(audio, use_fft=use_fft)[0])
        assert got.shape == z["logmel"].shape
        np.testing.assert_allclose(got, z["logmel"], atol=2e-4)


# ---------- bucketed preprocess frontend ----------

def test_make_mel_fn_bucket_boundary_lengths():
    """Regression: lengths whose frame count t is an exact bucket multiple
    but whose reflected length exceeds the bucket's sample need used to hit
    np.pad with a negative width (round-2 advisor finding). 16,400 samples
    gives t=64 with L+2p > need; both that case and an ordinary length must
    match the unbucketed frontend exactly."""
    from maskcyclegan_vc_tpu.cli.preprocess import make_mel_fn

    mel_fn = make_mel_fn(use_pallas=False)
    rs = np.random.RandomState(7)
    for n in (16_400, 16_384, 22_050, 16_128):
        audio = (0.3 * np.sin(np.arange(n) / 25.0)
                 + 0.01 * rs.randn(n)).astype(np.float32)
        got = mel_fn(audio)
        want = np.asarray(log_mel_spectrogram(jnp.asarray(audio)[None])[0])
        assert got.shape == want.shape, n
        np.testing.assert_allclose(got, want, atol=1e-5)
