"""Generate golden mel-frontend fixtures (melfb_golden.npz).

Implements the published librosa-0.8.0 / melgan-neurips ``Audio2Mel``
algorithm definitions INDEPENDENTLY of ``maskcyclegan_vc_tpu.data.melspec``
(librosa itself is not installed in this image, so the fixture is pinned
by a second, structurally different implementation):

  * triangles evaluated per mel band with ``np.interp`` over the three
    breakpoints (melspec.py uses the vectorized ramps/diff formulation);
  * STFT via ``np.fft.rfft`` over an explicit Python frame loop in
    float64 (melspec.py uses batched matmul-DFT in float32);
  * Slaney mel scale + Slaney area norm per the librosa definition
    (the formula constants are the spec itself and are shared).

Run from the repo root:  python tests/fixtures/gen_melfb_golden.py
Outputs ``tests/fixtures/melfb_golden.npz`` with:
  melfb  (80, 513)  the filterbank,
  audio  (33075,)   a fixed deterministic test signal (1.5 s @ 22050),
  logmel (80, T)    its log10-mel under the Audio2Mel contract
                    (reflect pad 384, hann periodic 1024, hop 256,
                    center=False, clamp 1e-5).
"""

import os

import numpy as np

SR = 22050
N_FFT = 1024
HOP = 256
N_MELS = 80


def hz_to_mel(f):
    # Slaney (HTK=False): linear below 1 kHz, log above.
    f = np.asarray(f, np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    logstep = np.log(6.4) / 27.0
    return np.where(
        f >= min_log_hz,
        min_log_hz / f_sp + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep,
        f / f_sp,
    )


def mel_to_hz(m):
    m = np.asarray(m, np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(
        m >= min_log_mel,
        min_log_hz * np.exp(logstep * (m - min_log_mel)),
        m * f_sp,
    )


def golden_filterbank():
    fft_freqs = np.linspace(0.0, SR / 2.0, N_FFT // 2 + 1)
    pts = mel_to_hz(np.linspace(hz_to_mel(0.0), hz_to_mel(SR / 2.0), N_MELS + 2))
    fb = np.zeros((N_MELS, fft_freqs.size), np.float64)
    for m in range(N_MELS):
        lo, c, hi = pts[m], pts[m + 1], pts[m + 2]
        tri = np.interp(fft_freqs, [lo, c, hi], [0.0, 1.0, 0.0],
                        left=0.0, right=0.0)
        # interp leaves the triangle=1 plateau wrong when lo==c; not the
        # case at these parameters, and endpoints get exact zeros.
        fb[m] = tri * (2.0 / (hi - lo))  # Slaney area norm
    return fb


def golden_logmel(audio):
    p = (N_FFT - HOP) // 2
    x = np.pad(audio.astype(np.float64), (p, p), mode="reflect")
    win = 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(N_FFT) / N_FFT))
    n_frames = 1 + (x.size - N_FFT) // HOP
    mags = np.empty((n_frames, N_FFT // 2 + 1), np.float64)
    for t in range(n_frames):
        seg = x[t * HOP : t * HOP + N_FFT] * win
        mags[t] = np.abs(np.fft.rfft(seg))
    mel = mags @ golden_filterbank().T  # (T, 80)
    return np.log10(np.maximum(mel, 1e-5)).T  # (80, T)


def test_signal():
    rs = np.random.RandomState(1234)
    n = int(1.5 * SR)
    t = np.arange(n) / SR
    x = (
        0.4 * np.sin(2 * np.pi * 440.0 * t)
        + 0.2 * np.sin(2 * np.pi * 1037.0 * t + 0.3)
        + 0.01 * rs.randn(n)
    )
    return x.astype(np.float32)


def main():
    audio = test_signal()
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "melfb_golden.npz")
    np.savez_compressed(
        out,
        melfb=golden_filterbank().astype(np.float32),
        audio=audio,
        logmel=golden_logmel(audio).astype(np.float32),
    )
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
