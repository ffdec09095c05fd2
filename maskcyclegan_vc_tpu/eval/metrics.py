"""Objective voice-conversion metrics: MCD and mel-spectral distance.

The reference evaluates conversions only by ear (TensorBoard audio +
released samples — /root/reference/mask_cyclegan_vc/train.py:332-358,
audio_samples/). The MaskCycleGAN-VC paper (arXiv:2102.12841) reports
MCD/MSD; this module provides those objective metrics so training runs
and the test CLI can be scored without a listening test.

NOTE: this MCD is computed from DCT-of-log-mel cepstra, NOT the
WORLD/SPTK-extracted mel-cepstra used in the paper — the absolute dB
values are a relative/regression metric only and are not directly
comparable to published MCD numbers.

Definitions used here (standard in the VC literature):

  * Mel-cepstra: orthonormal DCT-II over the natural-log mel spectrum.
    Our pipeline's mels are log10 (melgan-neurips frontend), so they are
    scaled by ln(10) first.
  * MCD between two aligned frames with cepstra c, c' (excluding the
    energy coefficient c0):
        MCD = (10 / ln 10) * sqrt(2 * sum_{d=1..D-1} (c_d - c'_d)^2)  [dB]
  * Utterance MCD: mean frame MCD along a DTW alignment path (converted
    vs. target utterances differ in length and timing; VCC2018's
    evaluation sentences are parallel across speakers, so index-paired
    utterances are comparable after DTW).
  * Mel-spectral distance (MSD): mean per-frame L2 distance between
    log-mel vectors along the same DTW path.

Cepstrum extraction is jittable (matmul DCT — MXU-friendly); the DTW
band search is a host-side numpy pass (eval cadence, not the hot loop).
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax.numpy as jnp
import numpy as np

_LN10 = math.log(10.0)
_MCD_ALPHA = 10.0 * math.sqrt(2.0) / _LN10


@lru_cache(maxsize=8)
def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II matrix (n, n): C[k, m] = s_k cos(pi k (2m+1) / 2n)."""
    k = np.arange(n)[:, None]
    m = np.arange(n)[None, :]
    mat = np.cos(np.pi * k * (2 * m + 1) / (2 * n))
    mat *= np.sqrt(2.0 / n)
    mat[0] *= np.sqrt(0.5)
    return mat.astype(np.float32)


def log_mel_cepstra(log10_mel, n_coef: int = 13):
    """Mel-cepstra from a log10-mel spectrogram.

    Args:
      log10_mel: (..., M, T) log10 mel spectrogram (denormalized — i.e.
        after ``mel * std + mean``, the scale the vocoder consumes).
      n_coef: number of cepstral coefficients to keep (incl. c0).

    Returns:
      (..., T, n_coef) cepstra, float32.
    """
    x = jnp.asarray(log10_mel, jnp.float32) * _LN10  # -> natural-log mel
    M = x.shape[-2]
    C = jnp.asarray(_dct_matrix(M)[:n_coef])  # (n_coef, M)
    # (..., M, T) -> (..., T, M) @ (M, n_coef)
    return jnp.swapaxes(x, -1, -2) @ C.T


def mcd(cep_a, cep_b, exclude_c0: bool = True):
    """Per-frame MCD (dB) between two already-aligned cepstrum sequences.

    cep_a, cep_b: (..., T, D). Returns (..., T).
    """
    a = jnp.asarray(cep_a, jnp.float32)
    b = jnp.asarray(cep_b, jnp.float32)
    if exclude_c0:
        a, b = a[..., 1:], b[..., 1:]
    return _MCD_ALPHA * jnp.sqrt(jnp.sum(jnp.square(a - b), axis=-1))


def _dtw_path(cost: np.ndarray):
    """Classic O(T1*T2) DTW on a frame-distance matrix; returns index pairs.

    The forward pass sweeps anti-diagonal wavefronts (every cell on
    diagonal i+j=d depends only on diagonals d-1, d-2), so each update is
    one vectorized numpy gather+min instead of a per-cell Python loop —
    ~two orders of magnitude faster on full-length (~800x800) utterances.
    """
    t1, t2 = cost.shape
    acc = np.full((t1 + 1, t2 + 1), np.inf, np.float64)
    acc[0, 0] = 0.0
    for d in range(2, t1 + t2 + 1):
        i = np.arange(max(1, d - t2), min(t1, d - 1) + 1)
        if i.size == 0:
            continue
        j = d - i
        acc[i, j] = cost[i - 1, j - 1] + np.minimum(
            np.minimum(acc[i - 1, j], acc[i, j - 1]), acc[i - 1, j - 1]
        )
    path = []
    i, j = t1, t2
    while i > 0 and j > 0:
        path.append((i - 1, j - 1))
        steps = (acc[i - 1, j - 1], acc[i - 1, j], acc[i, j - 1])
        k = int(np.argmin(steps))
        if k == 0:
            i, j = i - 1, j - 1
        elif k == 1:
            i -= 1
        else:
            j -= 1
    path.reverse()
    return np.asarray(path, np.int64)


def mcd_dtw(log10_mel_a, log10_mel_b, n_coef: int = 13,
            exclude_c0: bool = True):
    """DTW-aligned utterance MCD (dB) between two log10-mel spectrograms.

    Args:
      log10_mel_a, log10_mel_b: (M, Ta) / (M, Tb) denormalized log10 mels
        (e.g. a converted utterance and the parallel target utterance).

    Returns:
      (mean_mcd_db, path) — the mean frame MCD along the optimal DTW path
      and the (L, 2) alignment path itself.
    """
    ca = np.asarray(log_mel_cepstra(log10_mel_a, n_coef))  # (Ta, D)
    cb = np.asarray(log_mel_cepstra(log10_mel_b, n_coef))  # (Tb, D)
    if exclude_c0:
        ca_d, cb_d = ca[:, 1:], cb[:, 1:]
    else:
        ca_d, cb_d = ca, cb
    # Pairwise frame MCDs = the DTW local cost. float64: the Gram form
    # a^2+b^2-2ab leaves ~1e-6 residue in fp32, i.e. ~1e-2 dB after sqrt.
    ca_d = ca_d.astype(np.float64)
    cb_d = cb_d.astype(np.float64)
    d2 = (
        np.sum(ca_d**2, axis=1)[:, None]
        + np.sum(cb_d**2, axis=1)[None, :]
        - 2.0 * ca_d @ cb_d.T
    )
    cost = _MCD_ALPHA * np.sqrt(np.maximum(d2, 0.0))
    path = _dtw_path(cost)
    return float(cost[path[:, 0], path[:, 1]].mean()), path


def mel_spectral_distance(log10_mel_a, log10_mel_b, path=None):
    """Mean per-frame L2 distance (dB-like) between log10-mel vectors.

    With ``path=None`` the sequences must be equal length (already
    aligned); otherwise frames are paired along the given DTW path.
    """
    a = np.asarray(log10_mel_a, np.float32).T  # (Ta, M)
    b = np.asarray(log10_mel_b, np.float32).T
    if path is None:
        assert a.shape == b.shape, "unaligned inputs need a DTW path"
        pa, pb = a, b
    else:
        pa, pb = a[path[:, 0]], b[path[:, 1]]
    return float(np.mean(np.linalg.norm(pa - pb, axis=1)))
