"""SPTK-convention warped-cepstral analysis (eval/mcep.py).

No pysptk/pyworld oracle exists in this environment, so every component
is pinned against its defining mathematical property instead:

  * the real cepstrum IS the cosine series of the log spectrum;
  * freqt's output IS the same function re-expanded on the warped axis
    b(w) (evaluable in closed form);
  * alpha=0 warping is the identity; +alpha then -alpha round-trips;
  * MCD is zero for identical signals, gain-invariant (c0 excluded),
    and separates spectrally different signals.
"""

import numpy as np
import pytest

from maskcyclegan_vc_tpu.eval.mcep import (
    ALPHA_BY_SR,
    cepstrum_from_logspec,
    freqt,
    mcd_dtw_wav,
    mcd_frames,
    mcep_from_wav,
    warp_alpha,
    warped_frequency,
)


def _cosine_series(c, omega):
    """L(w) = c0 + sum_{m>=1} c_m cos(m w) (SPTK one-sided scale)."""
    m = np.arange(len(c))
    return c[0] + np.cos(np.outer(omega, m[1:])) @ c[1:]


def test_cepstrum_recovers_cosine_series():
    K = 513  # n_fft 1024 one-sided
    omega = np.pi * np.arange(K) / (K - 1)
    true_c = np.zeros(8)
    true_c[[0, 1, 3, 6]] = [1.5, -0.7, 0.25, 0.05]
    L = _cosine_series(true_c, omega)
    got = cepstrum_from_logspec(L, 12)
    np.testing.assert_allclose(got[:8], true_c, atol=1e-12)
    np.testing.assert_allclose(got[8:], 0.0, atol=1e-12)


def test_cepstrum_batched():
    K = 129
    omega = np.pi * np.arange(K) / (K - 1)
    cs = np.random.RandomState(0).randn(5, 4) * (0.5 ** np.arange(4))
    L = np.stack([_cosine_series(c, omega) for c in cs])
    got = cepstrum_from_logspec(L, 4)
    np.testing.assert_allclose(got, cs, atol=1e-12)


def test_freqt_alpha_zero_is_identity():
    rs = np.random.RandomState(1)
    c = rs.randn(3, 6)
    out = freqt(c, 9, 0.0)
    np.testing.assert_allclose(out[..., :6], c, atol=1e-14)
    np.testing.assert_allclose(out[..., 6:], 0.0, atol=1e-14)
    np.testing.assert_allclose(freqt(c, 3, 0.0), c[..., :4], atol=1e-14)


def test_freqt_represents_warped_spectrum():
    """Defining property: the warped cepstra are the cosine series of the
    SAME log spectrum on the warped frequency axis —
    Ltilde(b(w)) == L(w)."""
    rs = np.random.RandomState(2)
    alpha = 0.455
    c = rs.randn(10) * (0.6 ** np.arange(10))  # smooth (decaying) spectrum
    ct = freqt(c, 119, alpha)  # high order: truncation error negligible
    omega = np.linspace(0.0, np.pi, 301)
    L = _cosine_series(c, omega)
    Lt = _cosine_series(ct, warped_frequency(omega, alpha))
    np.testing.assert_allclose(Lt, L, atol=1e-8)


def test_freqt_round_trip():
    rs = np.random.RandomState(3)
    c = rs.randn(8) * (0.5 ** np.arange(8))
    back = freqt(freqt(c, 99, 0.455), 7, -0.455)
    np.testing.assert_allclose(back, c, atol=1e-9)


def test_warp_alpha_table():
    assert warp_alpha(22050) == pytest.approx(0.455)
    assert warp_alpha(16000) == pytest.approx(0.42)
    assert warp_alpha(22000) == pytest.approx(ALPHA_BY_SR[22050])


def _harmonic_tone(f0, sr=22050, dur=0.35, tilt=0.7, seed=0):
    t = np.arange(int(sr * dur)) / sr
    x = sum((tilt ** k) * np.sin(2 * np.pi * f0 * (k + 1) * t)
            for k in range(6))
    return (x / np.abs(x).max()).astype(np.float64)


def test_mcep_shapes_and_finiteness():
    wav = _harmonic_tone(220.0)
    mc = mcep_from_wav(wav, 22050, order=34)
    assert mc.shape[1] == 35
    assert mc.shape[0] > 10
    assert np.isfinite(mc).all()


def test_mcd_wav_zero_and_gain_invariant():
    wav = _harmonic_tone(220.0)
    # Gram-form pairwise distance leaves ~1e-16 f64 residue -> ~1e-7 dB
    # after the sqrt; zero only to that tolerance.
    d_same, path = mcd_dtw_wav(wav, wav)
    assert d_same == pytest.approx(0.0, abs=1e-6)
    assert (path[:, 0] == path[:, 1]).all()
    # c0 carries gain; the MCD sum starts at c1.
    d_gain, _ = mcd_dtw_wav(wav, 0.25 * wav)
    assert d_gain < 0.05
    mc = mcep_from_wav(wav)
    np.testing.assert_allclose(mcd_frames(mc, mc), 0.0, atol=1e-12)


def test_mcep_silent_input_finite():
    """All-zero audio hits the absolute log floor (frame peak 0) and must
    stay finite end to end."""
    silent = np.zeros(22050 // 2)
    mc = mcep_from_wav(silent)
    assert np.isfinite(mc).all()
    d, _ = mcd_dtw_wav(silent, _harmonic_tone(220.0))
    assert np.isfinite(d) and d > 0


def test_mcd_wav_separates_spectra():
    a = _harmonic_tone(220.0, tilt=0.8)
    b = _harmonic_tone(330.0, tilt=0.4)
    d, _ = mcd_dtw_wav(a, b)
    assert d > 3.0  # clearly different spectra read as several dB apart
