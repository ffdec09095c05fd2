"""Native C++ wav decoder/resampler vs the numpy reference path."""

import numpy as np
import pytest

from maskcyclegan_vc_tpu.data import audio_io
from maskcyclegan_vc_tpu.data import native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="g++ toolchain unavailable")


def test_decode_matches_numpy(tmp_path):
    rs = np.random.RandomState(0)
    x = np.clip(rs.randn(22050) * 0.3, -1, 1).astype(np.float32)
    p = str(tmp_path / "a.wav")
    audio_io.write_wav(p, x, 22050)
    a, sr_a = audio_io.read_wav(p)
    b, sr_b = native.read_wav(p)
    assert sr_a == sr_b == 22050
    np.testing.assert_array_equal(a, b)


def test_resample_matches_scipy():
    rs = np.random.RandomState(1)
    t = np.arange(16000) / 16000.0
    x = (np.sin(2 * np.pi * 440 * t) * 0.5 + 0.05 * rs.randn(t.size)).astype(np.float32)
    a = audio_io.resample(x, 16000, 22050)  # scipy polyphase
    b = native.resample(x, 16000, 22050)
    assert abs(a.size - b.size) <= 2
    n = min(a.size, b.size)
    # same filter family; interior should agree closely
    err = np.abs(a[100:n-100] - b[100:n-100]).max()
    assert err < 5e-3, f"max err {err}"


def test_decode_24bit(tmp_path):
    rs = np.random.RandomState(2)
    x = np.clip(rs.randn(1000) * 0.3, -1, 1)
    pcm = (x * 8388607).astype(np.int32)
    b = bytearray()
    for v in pcm:
        b += int(v & 0xFFFFFF).to_bytes(3, "little")
    import struct

    data_len = len(b)
    hdr = b"RIFF" + struct.pack("<I", 36 + data_len) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 22050, 22050 * 3, 3, 24)
    hdr += b"data" + struct.pack("<I", data_len)
    p = str(tmp_path / "b24.wav")
    with open(p, "wb") as f:
        f.write(hdr + bytes(b))
    a, _ = audio_io.read_wav(p)
    c, _ = native.read_wav(p)
    np.testing.assert_allclose(a, c, atol=1e-7)
    np.testing.assert_allclose(c, x, atol=2e-7)


def test_load_audio_end_to_end(tmp_path):
    """native.load_audio == audio_io.load_audio on a resampled file."""
    rs = np.random.RandomState(3)
    t = np.arange(48000) / 48000.0
    x = (0.4 * np.sin(2 * np.pi * 300 * t) + 0.02 * rs.randn(t.size)).astype(np.float32)
    p = str(tmp_path / "f48.wav")
    audio_io.write_wav(p, x, 48000)
    a = audio_io.load_audio(p, 22050)
    b = native.load_audio(p, 22050)
    n = min(a.size, b.size)
    assert abs(a.size - b.size) <= 2
    np.testing.assert_allclose(a[100:n - 100], b[100:n - 100], atol=5e-4)
