"""Objective VC metrics: DCT cepstra, frame MCD, DTW alignment, MSD.

The reference has no objective eval (listening only —
/root/reference/mask_cyclegan_vc/train.py:332-358); these metrics are a
build addition scored against closed-form and scipy oracles.
"""

import numpy as np
import pytest

from maskcyclegan_vc_tpu.eval.metrics import (
    _dct_matrix,
    _dtw_path,
    log_mel_cepstra,
    mcd,
    mcd_dtw,
    mel_spectral_distance,
)


def test_dct_matrix_matches_scipy():
    scipy_fft = pytest.importorskip("scipy.fft")
    x = np.random.RandomState(0).randn(80).astype(np.float32)
    ours = _dct_matrix(80) @ x
    ref = scipy_fft.dct(x, type=2, norm="ortho")
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_cepstra_shape_and_energy_coefficient():
    rs = np.random.RandomState(1)
    mel = rs.randn(80, 37).astype(np.float32)
    cep = np.asarray(log_mel_cepstra(mel, n_coef=13))
    assert cep.shape == (37, 13)
    # c0 of the orthonormal DCT-II is sqrt(1/M) * sum over mel bins (of ln-mel).
    expected_c0 = np.sqrt(1.0 / 80) * (mel * np.log(10)).sum(axis=0)
    np.testing.assert_allclose(cep[:, 0], expected_c0, rtol=1e-4, atol=1e-4)


def test_mcd_zero_on_identical_and_closed_form():
    rs = np.random.RandomState(2)
    mel = rs.randn(80, 10).astype(np.float32)
    cep = log_mel_cepstra(mel)
    assert float(np.asarray(mcd(cep, cep)).max()) == 0.0

    # One-coefficient perturbation: MCD = alpha * |delta|.
    cep2 = np.asarray(cep).copy()
    cep2[:, 3] += 0.5
    alpha = 10.0 * np.sqrt(2.0) / np.log(10.0)
    np.testing.assert_allclose(
        np.asarray(mcd(cep, cep2)), alpha * 0.5, rtol=1e-5)
    # c0 excluded by default: perturbing it changes nothing.
    cep3 = np.asarray(cep).copy()
    cep3[:, 0] += 100.0
    assert float(np.asarray(mcd(cep, cep3)).max()) == 0.0


def test_dtw_identity_and_shift():
    rs = np.random.RandomState(3)
    mel = rs.randn(80, 25).astype(np.float32)
    m, path = mcd_dtw(mel, mel)
    assert m == pytest.approx(0.0, abs=1e-4)
    np.testing.assert_array_equal(path[:, 0], path[:, 1])

    # A time-stretched copy (each frame doubled) aligns at ~zero cost
    # (the a^2+b^2-2ab distance form leaves ~1e-3 dB of fp32 noise).
    stretched = np.repeat(mel, 2, axis=1)
    m2, path2 = mcd_dtw(mel, stretched)
    assert m2 == pytest.approx(0.0, abs=2e-2)
    assert path2[0].tolist() == [0, 0]
    assert path2[-1].tolist() == [24, 49]


def test_dtw_path_monotone_and_optimal_small_case():
    cost = np.array([[0.0, 9.0], [9.0, 0.0], [9.0, 0.0]])
    path = _dtw_path(cost)
    # Monotone, connected, covers the corners.
    d = np.diff(path, axis=0)
    assert (d >= 0).all() and (d <= 1).all() and (d.sum(axis=1) >= 1).all()
    assert path[0].tolist() == [0, 0] and path[-1].tolist() == [2, 1]
    assert cost[path[:, 0], path[:, 1]].sum() == 0.0


def test_mel_spectral_distance():
    rs = np.random.RandomState(4)
    a = rs.randn(80, 12).astype(np.float32)
    assert mel_spectral_distance(a, a) == 0.0
    b = a + 1.0  # constant offset: L2 per frame = sqrt(80)
    assert mel_spectral_distance(a, b) == pytest.approx(np.sqrt(80.0), rel=1e-5)
    # DTW-aligned variant on unequal lengths.
    _, path = mcd_dtw(a, np.repeat(a, 2, axis=1))
    assert mel_spectral_distance(a, np.repeat(a, 2, axis=1), path) == \
        pytest.approx(0.0, abs=1e-5)
