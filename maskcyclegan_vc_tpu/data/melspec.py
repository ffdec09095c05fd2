"""On-device mel-spectrogram frontend (22.05 kHz, 80 bins).

Reimplements, in JAX, the exact pipeline the reference delegates to the
melgan-neurips ``Audio2Mel`` torch module
(``/root/reference/data_preprocessing/preprocess_vcc2018.py:29,34``):

    p = (n_fft - hop) // 2 = 384
    audio  = reflect_pad(audio, p)
    frames = stft(audio, n_fft=1024, hop=256, win=hann_periodic(1024),
                  center=False, onesided)
    mag    = |frames|
    mel    = mel_basis @ mag          # librosa slaney-norm filterbank
    logmel = log10(clamp(mel, 1e-5))

The mel filterbank reproduces ``librosa.filters.mel(sr, n_fft, n_mels,
fmin=0, fmax=None)`` defaults (HTK=False Slaney mel scale + Slaney area
normalization); librosa itself is not a dependency.

TPU-first design: the whole frontend is jittable and batched. The rFFT
is expressed as two real matmuls against precomputed DFT bases so the
work lands on the MXU (n_fft=1024 x 513 matmuls batch perfectly); this
is also the shape the later Pallas fusion uses. ``use_fft=True`` selects
``jnp.fft.rfft`` instead (useful on CPU).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 22050
N_FFT = 1024
HOP_LENGTH = 256
WIN_LENGTH = 1024
N_MELS = 80


def hz_to_mel_slaney(f):
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = f >= min_log_hz
    mels = np.where(log_region, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mels)
    return mels


def mel_to_hz_slaney(m):
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = m * f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = m >= min_log_mel
    freqs = np.where(log_region, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)
    return freqs


def mel_filterbank(
    sr: int = SAMPLE_RATE,
    n_fft: int = N_FFT,
    n_mels: int = N_MELS,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
) -> np.ndarray:
    """Slaney-scale, Slaney-normalized triangular mel filterbank.

    Matches ``librosa.filters.mel`` defaults (htk=False, norm='slaney')
    as used by the melgan-neurips frontend. Returns (n_mels, n_fft//2+1).
    """
    if fmax is None:
        fmax = sr / 2.0
    fft_freqs = np.linspace(0.0, sr / 2.0, n_fft // 2 + 1)
    mel_pts = np.linspace(hz_to_mel_slaney(fmin), hz_to_mel_slaney(fmax), n_mels + 2)
    hz_pts = mel_to_hz_slaney(mel_pts)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]

    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    # Slaney area normalization.
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    weights = weights * enorm[:, None]
    return weights.astype(np.float32)


def hann_window_periodic(n: int = WIN_LENGTH) -> np.ndarray:
    """torch.hann_window default (periodic=True)."""
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n) / n))).astype(np.float32)


@functools.lru_cache(maxsize=4)
def _dft_bases(n_fft: int):
    """Real/imag DFT bases (win applied separately): (n_fft, n_fft//2+1)."""
    k = np.arange(n_fft // 2 + 1)
    n = np.arange(n_fft)
    ang = -2.0 * np.pi * np.outer(n, k) / n_fft
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def frame_signal(audio, n_fft: int = N_FFT, hop: int = HOP_LENGTH):
    """(..., L) -> (..., n_frames, n_fft) strided frames, center=False."""
    L = audio.shape[-1]
    n_frames = 1 + (L - n_fft) // hop
    starts = jnp.arange(n_frames) * hop
    idx = starts[:, None] + jnp.arange(n_fft)[None, :]
    return audio[..., idx]


def log_mel_spectrogram(
    audio,
    mel_basis=None,
    *,
    use_fft: bool = False,
    precision: Optional[str] = "highest",
    pad: bool = True,
):
    """(..., L) float audio in [-1, 1] -> (..., n_mels, T) log10-mel.

    Exact contract of melgan-neurips Audio2Mel at 22050 Hz defaults.
    ``pad=False`` means the caller already applied the reflect padding
    (used by the bucketed preprocess path to keep jit shapes static).
    """
    if mel_basis is None:
        mel_basis = jnp.asarray(mel_filterbank())
    else:
        mel_basis = jnp.asarray(mel_basis)

    if pad:
        p = (N_FFT - HOP_LENGTH) // 2
        audio = jnp.pad(audio, [(0, 0)] * (audio.ndim - 1) + [(p, p)],
                        mode="reflect")
    frames = frame_signal(audio)  # (..., T, n_fft)
    win = jnp.asarray(hann_window_periodic())
    frames = frames * win

    if use_fft:
        spec = jnp.fft.rfft(frames, axis=-1)
        mag = jnp.abs(spec).astype(jnp.float32)
    else:
        cos_b, sin_b = _dft_bases(N_FFT)
        re = jnp.matmul(frames, jnp.asarray(cos_b), precision=precision)
        im = jnp.matmul(frames, jnp.asarray(sin_b), precision=precision)
        mag = jnp.sqrt(re * re + im * im + 1e-24)

    mel = jnp.matmul(mag, mel_basis.T, precision=precision)  # (..., T, n_mels)
    mel = jnp.swapaxes(mel, -1, -2)  # (..., n_mels, T)
    return jnp.log10(jnp.maximum(mel, 1e-5))
