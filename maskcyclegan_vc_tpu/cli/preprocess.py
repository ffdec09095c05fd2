"""Preprocess CLI: wav -> log-mel -> per-speaker z-norm -> pickles.

Reference contract (/root/reference/data_preprocessing/preprocess_vcc2018.py):
same flags, same on-disk output (<out>/<id>/<id>_normalized.pickle +
<id>_norm_stat.npz), same drop-short-utterance and +1e-9 std rules.
The mel frontend runs on-device (data/melspec.py) instead of via
torch.hub melgan + librosa.

    python -m maskcyclegan_vc_tpu.cli.preprocess \
        --data_directory vcc2018/vcc2018_training \
        --preprocessed_data_directory vcc2018_preprocessed/vcc2018_training \
        --speaker_ids VCC2SF3 VCC2TF1
"""

from __future__ import annotations

import argparse
import glob
import os

import jax
import jax.numpy as jnp
import numpy as np

from maskcyclegan_vc_tpu.data.audio_io import load_audio
from maskcyclegan_vc_tpu.data.dataset import compute_norm_stats, normalize, save_speaker
from maskcyclegan_vc_tpu.data.melspec import (
    HOP_LENGTH,
    N_FFT,
    SAMPLE_RATE,
    log_mel_spectrogram,
)

BUCKET_FRAMES = 64  # mel frames per jit shape bucket


def make_mel_fn(use_pallas: bool):
    """Bucketed frontend: reflect-pad on host, jit on a few fixed shapes.

    The reflect pad is applied to the *original* audio on host (so tail
    frames see the correct reflected samples), then zero-extended to the
    bucket length — jit therefore compiles once per bucket instead of
    once per utterance length. On TPU the fused Pallas kernel
    (ops/pallas/melspec_kernel.py) runs the whole frontend in one kernel;
    elsewhere the XLA matmul-DFT path (data/melspec.py) is used.
    """
    if use_pallas:
        from maskcyclegan_vc_tpu.ops.pallas.melspec_kernel import (
            log_mel_spectrogram_pallas,
        )

        core = jax.jit(lambda a: log_mel_spectrogram_pallas(a, pad=False))
    else:
        core = jax.jit(lambda a: log_mel_spectrogram(a, pad=False))

    p = (N_FFT - HOP_LENGTH) // 2

    def mel_fn(audio: np.ndarray) -> np.ndarray:
        t = (audio.shape[0] + 2 * p - N_FFT) // HOP_LENGTH + 1
        tb = -(-t // BUCKET_FRAMES) * BUCKET_FRAMES
        need = (tb - 1) * HOP_LENGTH + N_FFT  # padded samples for tb frames
        a = np.pad(audio, (p, p), mode="reflect")
        # When t is already a bucket multiple but the length is not
        # hop-aligned, the reflected audio can be LONGER than `need`
        # (need < L + 2p); clamp the pad width and truncate. The dropped
        # tail lies beyond frame t-1's window ((t-1)*hop + n_fft <= need),
        # and `need` is hop-aligned so the Pallas pad=False reshape holds.
        a = np.pad(a, (0, max(0, need - a.shape[0])))[:need]
        mel = np.asarray(core(jnp.asarray(a)[None])[0])
        return mel[:, :t]

    return mel_fn


def preprocess_speaker(data_dir: str, out_dir: str, speaker_id: str,
                       min_frames: int = 64, mel_fn=None,
                       collective_stats: bool = None) -> int:
    """wav dir -> normalized pickles + stats for one speaker.

    Per-speaker mean/std (the reference's single-process numpy pass,
    preprocess_vcc2018.py:39-41) are computed with mesh psum collectives
    (parallel/stats.py) whenever more than one device is visible —
    SURVEY §2.6 "collective normalization stats" — and with numpy on a
    single device, where a mesh adds nothing. Both produce the same
    statistics (pinned by tests/test_cli_e2e.py on the 8-device mesh).
    """
    wavs = sorted(
        glob.glob(os.path.join(data_dir, speaker_id, "**/*.wav"), recursive=True)
    )
    if not wavs:
        raise FileNotFoundError(f"no wavs under {data_dir}/{speaker_id}")
    if mel_fn is None:
        mel_fn = make_mel_fn(use_pallas=jax.default_backend() == "tpu")
    mels = []
    for w in wavs:
        audio = load_audio(w, target_sr=SAMPLE_RATE)
        mel = mel_fn(audio)
        if mel.shape[1] >= min_frames:  # preprocess_vcc2018.py:36
            mels.append(mel)
    if collective_stats is None:
        collective_stats = len(jax.devices()) > 1
    if collective_stats:
        from maskcyclegan_vc_tpu.parallel.stats import norm_stats_over_devices

        mean, std = norm_stats_over_devices(mels)
    else:
        mean, std = compute_norm_stats(mels)
    save_speaker(out_dir, speaker_id, normalize(mels, mean, std), mean, std)
    return len(mels)


def main(argv=None):
    from maskcyclegan_vc_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_directory", type=str, required=True)
    p.add_argument("--preprocessed_data_directory", type=str, required=True)
    p.add_argument("--speaker_ids", nargs="+", type=str, required=True)
    args = p.parse_args(argv)
    for sid in args.speaker_ids:
        n = preprocess_speaker(
            args.data_directory, args.preprocessed_data_directory, sid)
        print(f"{sid}: {n} utterances preprocessed")


if __name__ == "__main__":
    main()
