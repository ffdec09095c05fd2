"""ctypes bindings for the native wav decoder/resampler (native/wavio.cpp).

Builds the shared library on first use (g++ is in the image; pybind11 is
not, hence the C ABI + ctypes). All entry points mirror data/audio_io's
numpy implementations and raise ImportError if the toolchain is missing,
so callers can fall back.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from math import gcd
from typing import Optional, Tuple

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "native", "wavio.cpp")
_LIB_PATH = os.path.join(_REPO, "native", "libwavio.so")

_lib = None


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) or (
        os.path.exists(_SRC)
        and os.path.getmtime(_SRC) > os.path.getmtime(_LIB_PATH)
    ):
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB_PATH, _SRC],
            check=True, capture_output=True,
        )
    lib = ctypes.CDLL(_LIB_PATH)
    lib.wav_decode.restype = ctypes.c_longlong
    lib.wav_decode.argtypes = [
        ctypes.c_char_p, ctypes.c_longlong,
        ctypes.POINTER(ctypes.c_float), ctypes.c_longlong,
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.resample_poly.restype = ctypes.c_longlong
    lib.resample_poly.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_longlong,
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_longlong,
    ]
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def read_wav(path: str) -> Tuple[np.ndarray, int]:
    lib = _load()
    with open(path, "rb") as f:
        data = f.read()
    sr = ctypes.c_int(0)
    n = lib.wav_decode(data, len(data), None, 0, ctypes.byref(sr))
    if n < 0:
        raise ValueError(f"{path}: wav_decode error {n}")
    out = np.empty(n, np.float32)
    got = lib.wav_decode(
        data, len(data),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
        ctypes.byref(sr),
    )
    if got < 0:
        raise ValueError(f"{path}: wav_decode error {got}")
    return out[:got], sr.value


def resample(audio: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    if sr_in == sr_out:
        return np.asarray(audio, np.float32)
    lib = _load()
    g = gcd(sr_in, sr_out)
    L, M = sr_out // g, sr_in // g
    x = np.ascontiguousarray(audio, np.float32)
    n_out = lib.resample_poly(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), x.size, L, M, None, 0)
    out = np.empty(n_out, np.float32)
    got = lib.resample_poly(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), x.size, L, M,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_out)
    return out[:got]


def load_audio(path: str, target_sr: int = 22050) -> np.ndarray:
    x, sr = read_wav(path)
    return resample(x, sr, target_sr)
