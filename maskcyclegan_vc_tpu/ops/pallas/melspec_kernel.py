"""Fused Pallas STFT+mel kernel.

One kernel fuses the whole mel frontend (data/melspec.py contract:
frame -> hann window -> rDFT -> magnitude -> mel filterbank -> log10).

Layout trick: audio is laid out as rows of ``hop=256`` samples, so frame
``t`` is exactly rows ``[t, t+4)`` (n_fft = 4*hop). The windowed rDFT
then decomposes into four *contiguous* shifted matmuls

    re[t, k] = sum_j  span[t+j, :] @ (win * cos)[j*256:(j+1)*256, k]

— no strided access, no lane-crossing reshape, and each partial product
is a (128, 256) @ (256, 513) MXU matmul. The audio stays in HBM; each
program DMAs one 131x256 span into VMEM, and the framed matrix, the
re/im spectra, magnitudes and mel powers never touch HBM (the XLA
version materializes ~(T,1024)+(T,513)x3 intermediates).

Grid: (B, T/128) with 128 frames per tile. Inference-only (the frontend
never runs under grad); numerics match data/melspec.log_mel_spectrogram
which matches the melgan-neurips Audio2Mel contract.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from maskcyclegan_vc_tpu.data.melspec import (
    HOP_LENGTH,
    N_FFT,
    N_MELS,
    _dft_bases,
    hann_window_periodic,
    mel_filterbank,
)

FRAMES_PER_TILE = 128
_ROWS_PER_FRAME = N_FFT // HOP_LENGTH  # 4
_N_BINS = N_FFT // 2 + 1  # 513


@functools.lru_cache(maxsize=2)
def _windowed_bases():
    """(4, 256, 513) win*cos and win*sin partial-DFT bases."""
    cos_b, sin_b = _dft_bases(N_FFT)  # (1024, 513)
    win = hann_window_periodic()[:, None]  # (1024, 1)
    wc = (win * cos_b).reshape(_ROWS_PER_FRAME, HOP_LENGTH, _N_BINS)
    ws = (win * sin_b).reshape(_ROWS_PER_FRAME, HOP_LENGTH, _N_BINS)
    return wc.astype(np.float32), ws.astype(np.float32)


SPAN_ROWS = 136  # 128 frames + 3 overlap rows, rounded up to a sublane multiple


def _melspec_kernel(audio_hbm, wc_ref, ws_ref, mel_ref, out_ref, span_ref, sem):
    b = pl.program_id(0)
    tt = pl.program_id(1)

    dma = pltpu.make_async_copy(
        audio_hbm.at[b, pl.ds(tt * FRAMES_PER_TILE, SPAN_ROWS), :], span_ref, sem
    )
    dma.start()
    dma.wait()

    re = jnp.zeros((FRAMES_PER_TILE, _N_BINS), jnp.float32)
    im = jnp.zeros((FRAMES_PER_TILE, _N_BINS), jnp.float32)
    for j in range(_ROWS_PER_FRAME):
        block = span_ref[pl.ds(j, FRAMES_PER_TILE), :]  # (128, 256)
        # HIGHEST: true-f32 MXU passes — bf16-rounded inputs cost ~1e-2 in
        # log space near the clamp, breaking frontend parity.
        re = re + jnp.dot(block, wc_ref[j], preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
        im = im + jnp.dot(block, ws_ref[j], preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)

    mag = jnp.sqrt(re * re + im * im + 1e-24)
    mel = jnp.dot(mag, mel_ref[:], preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    out_ref[0] = jnp.log(jnp.maximum(mel, 1e-5)) * np.float32(1.0 / np.log(10.0))


@functools.partial(jax.jit, static_argnames=("interpret", "pad"))
def log_mel_spectrogram_pallas(audio, *, interpret: bool = False,
                               pad: bool = True):
    """(B, L) audio -> (B, n_mels, T) log10-mel, fully fused on TPU.

    Same output as data/melspec.log_mel_spectrogram (reflect pad
    included); T is the Audio2Mel frame count for length L. With
    ``pad=False`` the caller already reflect-padded the audio (bucketed
    preprocess path); T is then the center=False frame count.
    """
    B, L = audio.shape
    p = (N_FFT - HOP_LENGTH) // 2
    padded_len = L + 2 * p if pad else L
    t_total = (padded_len - N_FFT) // HOP_LENGTH + 1
    n_tiles = -(-t_total // FRAMES_PER_TILE)
    t_pad = n_tiles * FRAMES_PER_TILE

    # Reflect-pad, then zero-extend so every span DMA is in bounds and the
    # length is a whole number of hop-rows.
    need = ((n_tiles - 1) * FRAMES_PER_TILE + SPAN_ROWS) * HOP_LENGTH
    if pad:
        audio = jnp.pad(audio, ((0, 0), (p, p)), mode="reflect")
    audio = jnp.pad(audio, ((0, 0), (0, max(0, need - padded_len))))
    rows_total = audio.shape[1] // HOP_LENGTH
    audio = audio.reshape(B, rows_total, HOP_LENGTH)

    wc, ws = _windowed_bases()
    melT = mel_filterbank().T  # (513, n_mels)

    out = pl.pallas_call(
        _melspec_kernel,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),  # audio stays in HBM
            pl.BlockSpec((_ROWS_PER_FRAME, HOP_LENGTH, _N_BINS),
                         lambda b, t: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS_PER_FRAME, HOP_LENGTH, _N_BINS),
                         lambda b, t: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_N_BINS, N_MELS), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, FRAMES_PER_TILE, N_MELS), lambda b, t: (b, t, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, t_pad, N_MELS), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((SPAN_ROWS, HOP_LENGTH), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(audio, jnp.asarray(wc), jnp.asarray(ws), jnp.asarray(melT))

    return jnp.swapaxes(out[:, :t_total, :], 1, 2)
