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
from maskcyclegan_vc_tpu.data.melspec import SAMPLE_RATE, log_mel_spectrogram


def preprocess_speaker(data_dir: str, out_dir: str, speaker_id: str,
                       min_frames: int = 64) -> int:
    wavs = sorted(
        glob.glob(os.path.join(data_dir, speaker_id, "**/*.wav"), recursive=True)
    )
    if not wavs:
        raise FileNotFoundError(f"no wavs under {data_dir}/{speaker_id}")
    mel_fn = jax.jit(lambda a: log_mel_spectrogram(a[None])[0])
    mels = []
    for w in wavs:
        audio = load_audio(w, target_sr=SAMPLE_RATE)
        mel = np.asarray(mel_fn(jnp.asarray(audio)))
        if mel.shape[1] >= min_frames:  # preprocess_vcc2018.py:36
            mels.append(mel)
    mean, std = compute_norm_stats(mels)
    save_speaker(out_dir, speaker_id, normalize(mels, mean, std), mean, std)
    return len(mels)


def main(argv=None):
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
