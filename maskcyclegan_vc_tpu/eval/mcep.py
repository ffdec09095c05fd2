"""SPTK-convention mel-cepstral analysis and waveform MCD.

Published MaskCycleGAN-VC MCD numbers (arXiv:2102.12841 §5) are computed
from mel-cepstra extracted with an all-pass frequency warp (the SPTK
``mcep``/WORLD pipeline), not from DCT-of-log-mel cepstra. This module
provides that convention for waveforms:

  * :func:`cepstrum_from_logspec` — real cepstrum of a one-sided log
    spectrum (the cosine-series coefficients of ``L(w)``).
  * :func:`freqt` — the all-pass frequency transform (Oppenheim's
    recursion, SPTK ``freqt``): re-expands a cepstrum on the warped
    frequency axis ``b(w) = w + 2 atan(a sin w / (1 - a cos w))``.
    With warp factor a=0.455 (22.05 kHz convention) the warped axis
    approximates the mel scale.
  * :func:`mcep_from_wav` — order-34 warped cepstra per STFT frame.
  * :func:`mcd_dtw_wav` — DTW-aligned utterance MCD (dB) between two
    waveforms, ``(10*sqrt(2)/ln 10) * ||dc_{1..34}||`` per frame.

Caveat (documented, like eval/metrics.py's): the spectrum here is the
STFT periodogram, not a WORLD/CheapTrick F0-adaptive envelope, so
absolute dB values still sit above envelope-based pipelines (the
periodogram keeps harmonic ripple that the envelope smooths away).
Relative comparisons (checkpoints, systems on the same data) use the
published convention's warping, order, and constant.

The reference repo has no objective metrics at all (SURVEY §4 — human
listening only); host-side numpy is fine at eval cadence.
"""

from __future__ import annotations

import math

import numpy as np

_LN10 = math.log(10.0)
MCD_CONST = 10.0 * math.sqrt(2.0) / _LN10

#: All-pass warp factors approximating the mel scale (SPTK convention).
ALPHA_BY_SR = {8000: 0.31, 10000: 0.35, 12000: 0.37, 16000: 0.42,
               22050: 0.455, 32000: 0.50, 44100: 0.544, 48000: 0.554}


def warp_alpha(sr: int) -> float:
    """Mel-approximating all-pass warp factor for a sample rate."""
    if sr in ALPHA_BY_SR:
        return ALPHA_BY_SR[sr]
    # Nearest tabulated rate — the table covers every rate this
    # framework's audio path can produce (22.05 kHz canonical).
    best = min(ALPHA_BY_SR, key=lambda k: abs(k - sr))
    return ALPHA_BY_SR[best]


def warped_frequency(omega, alpha: float):
    """b(w): phase response of the first-order all-pass at warp ``alpha``."""
    omega = np.asarray(omega, np.float64)
    return omega + 2.0 * np.arctan2(
        alpha * np.sin(omega), 1.0 - alpha * np.cos(omega))


def cepstrum_from_logspec(logspec, n_coef: int):
    """Minimum-phase (one-sided) real cepstrum of a log spectrum.

    SPTK convention: coefficients such that
    ``L(w) = c0 + sum_{m>=1} c_m cos(m w)`` — i.e. the symmetric-IDFT
    cepstrum with m>=1 terms DOUBLED (``log H(z) = sum_m c_m z^-m`` for
    minimum-phase H). This is the scale ``freqt`` warps losslessly
    (``Re C(e^{jw}) = Re Ctilde(e^{j b(w)})``) and the scale the
    published MCD constant assumes.

    Args:
      logspec: (..., K) log-magnitude spectrum sampled at
        ``w_k = pi*k/(K-1)``, k=0..K-1 (i.e. K = n_fft//2 + 1 one-sided
        bins of an even-length FFT).
      n_coef: coefficients to keep (c0..c_{n_coef-1}).

    Returns:
      (..., n_coef) cepstra, float64.
    """
    L = np.asarray(logspec, np.float64)
    n_fft = 2 * (L.shape[-1] - 1)
    c = np.fft.irfft(L, n=n_fft, axis=-1)[..., :n_coef].copy()
    c[..., 1:] *= 2.0
    return c


def freqt(c, order: int, alpha: float):
    """All-pass frequency transform of cepstra (SPTK ``freqt``).

    Args:
      c: (..., M) input cepstra (cosine-series coefficients on the
        linear frequency axis).
      order: output order (returns ``order + 1`` coefficients).
      alpha: warp factor; the output cepstra represent the same log
        spectrum re-expanded on the ``b(w)`` axis. ``freqt(c, n, 0)``
        is truncation/zero-padding; ``freqt(freqt(c, big, a), M-1, -a)``
        recovers ``c`` up to truncation.

    Returns:
      (..., order + 1) warped cepstra.
    """
    c = np.asarray(c, np.float64)
    m1 = c.shape[-1]
    out_n = order + 1
    d = np.zeros(c.shape[:-1] + (out_n,), np.float64)
    beta = 1.0 - alpha * alpha
    # Oppenheim's recursion, input coefficients fed highest-first.
    for i in range(m1 - 1, -1, -1):
        prev = d
        d = np.empty_like(prev)
        d[..., 0] = c[..., i] + alpha * prev[..., 0]
        if out_n > 1:
            d[..., 1] = beta * prev[..., 0] + alpha * prev[..., 1]
        for m in range(2, out_n):
            d[..., m] = prev[..., m - 1] + alpha * (
                prev[..., m] - d[..., m - 1])
    return d


def _stft_logmag(wav, n_fft: int, hop: int):
    """(T, K) one-sided log-magnitude STFT, Hann window, reflect-centered
    (the same framing contract as the mel frontend, data/melspec.py).

    The log floor is FRAME-RELATIVE (100 dB below the frame peak): an
    absolute floor would clamp window-sidelobe bins so a pure gain
    change alters the floored spectrum's shape, breaking the metric's
    c0-carries-gain invariance; a relative floor shifts every bin by
    ``log g`` uniformly."""
    x = np.asarray(wav, np.float64).reshape(-1)
    pad = n_fft // 2
    x = np.pad(x, (pad, pad), mode="reflect")
    n_frames = 1 + (len(x) - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = x[idx] * np.hanning(n_fft + 1)[:-1]
    spec = np.abs(np.fft.rfft(frames, axis=-1))
    floor = np.maximum(spec.max(axis=-1, keepdims=True) * 1e-5, 1e-10)
    return np.log(np.maximum(spec, floor))


def mcep_from_wav(wav, sr: int = 22050, order: int = 34,
                  alpha: float | None = None, n_fft: int = 1024,
                  hop: int = 256, n_lin_coef: int = 257):
    """Warped (mel-) cepstra per STFT frame of a waveform.

    Returns (T, order + 1) float64 mel-cepstra in natural-log units.
    """
    if alpha is None:
        alpha = warp_alpha(sr)
    L = _stft_logmag(wav, n_fft, hop)
    c = cepstrum_from_logspec(L, n_lin_coef)
    return freqt(c, order, alpha)


def mcd_frames(mc_a, mc_b):
    """Per-frame MCD (dB) between aligned warped-cepstrum sequences,
    excluding c0 (gain)."""
    a = np.asarray(mc_a, np.float64)[..., 1:]
    b = np.asarray(mc_b, np.float64)[..., 1:]
    return MCD_CONST * np.sqrt(np.sum(np.square(a - b), axis=-1))


def mcd_dtw_wav(wav_a, wav_b, sr: int = 22050, order: int = 34,
                alpha: float | None = None, n_fft: int = 1024,
                hop: int = 256):
    """DTW-aligned utterance MCD (dB) between two waveforms.

    The published convention: order-34 mel-cepstra (c0 excluded),
    Kominek constant, mean over the optimal DTW alignment. Returns
    ``(mean_mcd_db, path)``.
    """
    from maskcyclegan_vc_tpu.eval.metrics import _dtw_path

    ca = mcep_from_wav(wav_a, sr, order, alpha, n_fft, hop)[:, 1:]
    cb = mcep_from_wav(wav_b, sr, order, alpha, n_fft, hop)[:, 1:]
    d2 = (
        np.sum(ca**2, axis=1)[:, None]
        + np.sum(cb**2, axis=1)[None, :]
        - 2.0 * ca @ cb.T
    )
    cost = MCD_CONST * np.sqrt(np.maximum(d2, 0.0))
    path = _dtw_path(cost)
    return float(cost[path[:, 0], path[:, 1]].mean()), path
