"""Griffin-Lim vocoder-free decode (data/griffin_lim.py)."""

import numpy as np
import pytest

from maskcyclegan_vc_tpu.data.griffin_lim import (
    decode_mel_griffin_lim,
    griffin_lim,
    mel_to_linear,
)
from maskcyclegan_vc_tpu.data.melspec import HOP_LENGTH, log_mel_spectrogram
from maskcyclegan_vc_tpu.data.synth import (
    DEFAULT_SPEAKERS,
    make_content,
    synth_utterance,
)
from maskcyclegan_vc_tpu.eval.f0 import f0_from_waveform, median_f0


@pytest.fixture(scope="module")
def utterance():
    import jax.numpy as jnp

    c = make_content(np.random.RandomState(0))
    wav = synth_utterance(DEFAULT_SPEAKERS["VCC2SF3"], c)
    mel = np.asarray(log_mel_spectrogram(jnp.asarray(wav)[None],
                                         use_fft=True))[0]
    return wav, mel


def test_roundtrip_preserves_pitch_and_spectrum(utterance):
    import jax.numpy as jnp

    wav, mel = utterance
    rec = decode_mel_griffin_lim(mel, n_iter=40)
    assert rec.shape == (mel.shape[1] * HOP_LENGTH,)
    assert np.isfinite(rec).all() and np.abs(rec).max() <= 1.0

    f0_orig = median_f0(*f0_from_waveform(wav))
    f0_rec = median_f0(*f0_from_waveform(rec))
    assert abs(f0_rec - f0_orig) < 0.03 * f0_orig

    mel2 = np.asarray(log_mel_spectrogram(jnp.asarray(rec)[None],
                                          use_fft=True))[0]
    T = min(mel.shape[1], mel2.shape[1])
    corr = np.corrcoef(mel[:, :T].ravel(), mel2[:, :T].ravel())[0, 1]
    assert corr > 0.9, f"log-mel round-trip correlation {corr:.3f}"


def test_denormalization_contract(utterance):
    """Normalized mel + stats == denormalized mel (same seed phase init)."""
    _, mel = utterance
    mean = mel.mean(axis=1, keepdims=True)
    std = mel.std(axis=1, keepdims=True) + 1e-9
    a = decode_mel_griffin_lim(mel, n_iter=8)
    b = decode_mel_griffin_lim((mel - mean) / std, mean, std, n_iter=8)
    np.testing.assert_allclose(a, b, atol=2e-4)


def test_mel_to_linear_nonnegative(utterance):
    _, mel = utterance
    spec = np.asarray(mel_to_linear(mel))
    assert spec.shape == (513, mel.shape[1])
    assert (spec >= 0).all()


def test_griffin_lim_converges(utterance):
    """More iterations -> better magnitude fit (projection residual falls)."""
    _, mel = utterance
    spec = mel_to_linear(mel)

    def residual(n):
        wav = griffin_lim(spec, n_iter=n, seed=0)
        rebuilt = np.abs(_stft_np(np.asarray(wav)))  # (F, T)
        m = np.asarray(spec)
        T = min(rebuilt.shape[1], m.shape[1])
        # Peak-normalize both (GL output is peak-scaled).
        a = rebuilt[:, :T] / rebuilt[:, :T].max()
        b = m[:, :T] / m[:, :T].max()
        return float(np.mean(np.abs(a - b)))

    assert residual(30) < residual(2)


def _stft_np(x):
    from maskcyclegan_vc_tpu.data.melspec import (
        N_FFT,
        hann_window_periodic,
    )

    n_frames = 1 + (x.shape[-1] - N_FFT) // HOP_LENGTH
    idx = (np.arange(n_frames)[:, None] * HOP_LENGTH
           + np.arange(N_FFT)[None, :])
    return np.fft.rfft(x[idx] * hann_window_periodic(), axis=-1).T
