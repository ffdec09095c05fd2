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
