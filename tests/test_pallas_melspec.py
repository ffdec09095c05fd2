"""Fused Pallas STFT+mel kernel vs the reference-contract XLA frontend.

Runs in interpreter mode on the CPU test platform; the compiled TPU path
is exercised by bench.py / benchmarks on hardware.
"""

import jax.numpy as jnp
import numpy as np

from maskcyclegan_vc_tpu.data.melspec import log_mel_spectrogram
from maskcyclegan_vc_tpu.ops.pallas.melspec_kernel import log_mel_spectrogram_pallas


def test_pallas_melspec_matches_xla():
    rs = np.random.RandomState(0)
    x = jnp.asarray((rs.randn(2, 22050) * 0.3).astype(np.float32))
    a = np.asarray(log_mel_spectrogram(x))
    b = np.asarray(log_mel_spectrogram_pallas(x, interpret=True))
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_pallas_melspec_long_audio_multi_tile():
    """> FRAMES_PER_TILE frames -> multiple grid tiles per batch row."""
    rs = np.random.RandomState(1)
    n = 22050 * 2  # ~172 frames = 2 tiles of 128
    x = jnp.asarray((rs.randn(1, n) * 0.2).astype(np.float32))
    a = np.asarray(log_mel_spectrogram(x))
    b = np.asarray(log_mel_spectrogram_pallas(x, interpret=True))
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_bucketed_preprocess_path_matches_direct():
    """make_mel_fn (host reflect-pad + zero-extend to bucket + crop) must
    equal the direct padded frontend, for both backends' cores."""
    from maskcyclegan_vc_tpu.cli.preprocess import make_mel_fn

    rs = np.random.RandomState(2)
    for n in (22050, 22050 + 777):  # off-bucket lengths
        audio = (rs.randn(n) * 0.3).astype(np.float32)
        want = np.asarray(log_mel_spectrogram(jnp.asarray(audio)[None])[0])
        got_xla = make_mel_fn(use_pallas=False)(audio)
        np.testing.assert_allclose(got_xla, want, atol=1e-5)
        assert got_xla.shape == want.shape


def test_pallas_pad_false_matches_prepadded():
    from maskcyclegan_vc_tpu.data.melspec import HOP_LENGTH, N_FFT

    rs = np.random.RandomState(3)
    audio = (rs.randn(1, 22050) * 0.3).astype(np.float32)
    want = np.asarray(log_mel_spectrogram_pallas(jnp.asarray(audio), interpret=True))
    p = (N_FFT - HOP_LENGTH) // 2
    pre = np.pad(audio, ((0, 0), (p, p)), mode="reflect")
    got = np.asarray(log_mel_spectrogram_pallas(
        jnp.asarray(pre), interpret=True, pad=False))
    np.testing.assert_allclose(got, want, atol=1e-6)
