"""F0 tracker (eval/f0.py) + synthetic corpus (data/synth.py) tests."""

import numpy as np
import pytest

from maskcyclegan_vc_tpu.data.melspec import SAMPLE_RATE, log_mel_spectrogram
from maskcyclegan_vc_tpu.data.synth import (
    DEFAULT_SPEAKERS,
    make_content,
    make_corpus,
    synth_utterance,
)
from maskcyclegan_vc_tpu.eval.f0 import (
    f0_from_log_mel,
    f0_from_waveform,
    median_f0,
    utterance_f0,
)


def _mel(wav):
    import jax.numpy as jnp

    return np.asarray(log_mel_spectrogram(jnp.asarray(wav)[None],
                                          use_fft=True))[0]


@pytest.mark.parametrize("f0_true", [110.0, 220.0, 330.0])
def test_waveform_tracker_on_pure_harmonics(f0_true):
    t = np.arange(int(1.0 * SAMPLE_RATE)) / SAMPLE_RATE
    wav = sum(np.sin(2 * np.pi * k * f0_true * t) / k for k in range(1, 6))
    f0, voiced = f0_from_waveform(np.asarray(wav, np.float32))
    assert voiced.mean() > 0.9
    assert abs(median_f0(f0, voiced) - f0_true) < 2.0


@pytest.mark.parametrize("f0_true", [110.0, 220.0, 330.0])
def test_mel_tracker_on_pure_harmonics(f0_true):
    t = np.arange(int(1.0 * SAMPLE_RATE)) / SAMPLE_RATE
    wav = sum(np.sin(2 * np.pi * k * f0_true * t) / k for k in range(1, 6))
    f0, voiced = f0_from_log_mel(_mel(np.asarray(wav, np.float32)))
    assert voiced.mean() > 0.9
    assert abs(median_f0(f0, voiced) - f0_true) < 4.0


def test_silence_is_unvoiced():
    f0, voiced = f0_from_waveform(np.zeros(SAMPLE_RATE, np.float32))
    assert not voiced.any()
    assert median_f0(f0, voiced) == 0.0
    # White noise: aperiodic -> (almost) nothing should gate as voiced.
    rs = np.random.RandomState(0)
    f0n, vn = f0_from_waveform(rs.randn(SAMPLE_RATE).astype(np.float32) * 0.1)
    assert vn.mean() < 0.2


def test_trackers_agree_on_synth_speakers():
    """Waveform and mel-domain trackers recover each speaker's register."""
    c = make_content(np.random.RandomState(0))
    for sid, spec in DEFAULT_SPEAKERS.items():
        wav = synth_utterance(spec, c)
        w = median_f0(*f0_from_waveform(wav))
        m = median_f0(*f0_from_log_mel(_mel(wav)))
        target = spec.f0_base + c.f0_frac * spec.f0_spread
        assert abs(w - target) < 0.05 * target, (sid, w, target)
        assert abs(m - w) < 0.03 * w, (sid, m, w)


def test_utterance_f0_denormalizes():
    c = make_content(np.random.RandomState(1))
    wav = synth_utterance(DEFAULT_SPEAKERS["VCC2TF1"], c)
    mel = _mel(wav)
    mean = mel.mean(axis=1, keepdims=True)
    std = mel.std(axis=1, keepdims=True) + 1e-9
    norm = (mel - mean) / std
    a = utterance_f0(mel)
    b = utterance_f0(norm, mean, std)
    # float32 normalize/denormalize round-trip can flip borderline
    # voicing-gate frames; the median must stay within 2%.
    assert abs(a - b) < 0.02 * a


def test_parallel_corpus_shares_content(tmp_path):
    from maskcyclegan_vc_tpu.data.audio_io import load_audio

    out = make_corpus(str(tmp_path), n_utts=2, parallel=True, seed=3)
    wavs = {sid: [load_audio(p, target_sr=SAMPLE_RATE) for p in ps]
            for sid, ps in out.items()}
    (a0, a1), (b0, b1) = wavs["VCC2SF3"], wavs["VCC2TF1"]
    # Parallel: index-paired utterances have identical durations
    # (same Content) but different voices (different waveforms).
    assert a0.shape == b0.shape and a1.shape == b1.shape
    assert a0.shape != a1.shape  # different content across indices
    assert np.abs(a0 - b0).max() > 1e-3
    # And the F0 registers differ in the expected direction.
    fa = median_f0(*f0_from_waveform(a0))
    fb = median_f0(*f0_from_waveform(b0))
    assert fb > fa + 50.0


def test_nonparallel_corpus_is_speaker_order_stable(tmp_path):
    """Adding a speaker never changes another speaker's utterances."""
    from maskcyclegan_vc_tpu.data.audio_io import load_audio

    two = make_corpus(str(tmp_path / "two"), n_utts=2, seed=5)
    three = make_corpus(
        str(tmp_path / "three"),
        speakers={k: DEFAULT_SPEAKERS[k]
                  for k in ("VCC2SF3", "VCC2TF1", "VCC2SM3")},
        n_utts=2, seed=5)
    for sid in two:
        for p2, p3 in zip(two[sid], three[sid]):
            np.testing.assert_array_equal(
                load_audio(p2, target_sr=SAMPLE_RATE),
                load_audio(p3, target_sr=SAMPLE_RATE))
