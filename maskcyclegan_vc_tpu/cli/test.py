"""Inference CLI: convert a speaker's utterances and write wavs.

Reference contract (/root/reference/mask_cyclegan_vc/test.py): loads one
generator at --load_epoch, converts every source utterance full-length
with a ones mask, denormalizes with the **target** speaker's stats
(test.py:94-95 — the vocal-tract transplant), writes
``{i}-converted_{A}_to_{B}.wav`` and ``{i}-original_...wav``.

Checkpoints: ours (``NNNNN_state.npz``) or a directory of reference
``.pth.tar`` files (auto-detected). Without --vocoder_ckpt the converted
mels are saved as ``.npy`` instead of decoded audio.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from maskcyclegan_vc_tpu.data.dataset import load_speaker
from maskcyclegan_vc_tpu.models import Generator


def load_generator_params(ckpt_dir: str, load_epoch: int, model_name: str,
                          n_mels: int = 80, residual_channels: int = 256):
    """Load generator params from our npz or reference pth.tar layout."""
    ours = os.path.join(ckpt_dir, f"{load_epoch:05d}_state.npz")
    if os.path.exists(ours):
        from maskcyclegan_vc_tpu.io.checkpoint import load_checkpoint_subtree

        key = {"generator_A2B": "A2B", "generator_B2A": "B2A"}[model_name]
        # Subtree read: one generator's leaves only, not the ~1 GB full
        # TrainState with optimizer moments.
        return load_checkpoint_subtree(ours, f"g_params/{key}")
    ref = os.path.join(ckpt_dir, f"{load_epoch:05d}_{model_name}.pth.tar")
    if os.path.exists(ref):
        from maskcyclegan_vc_tpu.io.torch_import import (
            generator_params_from_torch,
            load_pth_tar,
        )

        sd, _ = load_pth_tar(ref)
        return jax.tree.map(jnp.asarray, generator_params_from_torch(sd))
    raise FileNotFoundError(f"no checkpoint for epoch {load_epoch} in {ckpt_dir}")


def make_convert_fn(gen: Generator):
    """Jitted full-length conversion (ones mask), bucketed to T%64==0.

    One jitted callable; jax.jit recompiles per bucket width and caches,
    so a corpus of utterances costs a handful of compiles, not eager
    op-by-op dispatch per utterance.
    """
    apply = jax.jit(lambda p, x, m, l: gen.apply(p, x, m, lengths=l))

    def convert(params, mel: np.ndarray) -> np.ndarray:
        t = mel.shape[1]
        bucket = ((t + 63) // 64) * 64
        x = np.zeros((1, mel.shape[0], bucket), np.float32)
        x[0, :, :t] = mel
        y = apply(params, jnp.asarray(x),
                  jnp.ones((1, mel.shape[0], bucket), jnp.float32),
                  jnp.asarray([t]))
        return np.asarray(y)[0, :, :t]

    return convert


def convert_utterance(gen: Generator, params, mel: np.ndarray) -> np.ndarray:
    """One-shot convenience wrapper around ``make_convert_fn``."""
    return make_convert_fn(gen)(params, mel)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--name", type=str, default="mask_cyclegan_vc")
    p.add_argument("--save_dir", type=str, default="results")
    p.add_argument("--preprocessed_data_dir", type=str, required=True)
    p.add_argument("--speaker_A_id", type=str, default="VCC2SF3")
    p.add_argument("--speaker_B_id", type=str, default="VCC2TF1")
    p.add_argument("--ckpt_dir", type=str, required=True)
    p.add_argument("--load_epoch", type=int, required=True)
    p.add_argument("--model_name", type=str, default="generator_A2B",
                   choices=["generator_A2B", "generator_B2A"])
    p.add_argument("--vocoder_ckpt", type=str, default=None)
    p.add_argument("--sample_rate", type=int, default=22050)
    p.add_argument("--n_mels", type=int, default=80)
    p.add_argument("--residual_channels", type=int, default=256)
    p.add_argument("--compute_mcd", action="store_true",
                   help="report DTW-aligned MCD/MSD of each conversion vs "
                        "the index-paired target utterance (VCC2018 eval "
                        "sentences are parallel across speakers)")
    p.add_argument("--griffin_lim", action="store_true",
                   help="without --vocoder_ckpt, decode audible wavs via "
                        "Griffin-Lim phase retrieval (no learned vocoder "
                        "needed; lower quality than MelGAN) instead of "
                        "writing .npy mels")
    p.add_argument("--griffin_lim_iters", type=int, default=60)
    from maskcyclegan_vc_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    args = p.parse_args(argv)
    from maskcyclegan_vc_tpu.cli.train import print_options
    print(print_options(args), flush=True)
    # Args snapshot next to the run outputs, reference contract
    # (/root/reference/args/base_arg_parser.py:80-86 writes
    # test_args.json into save_dir/name).
    run_dir = os.path.join(args.save_dir, args.name)
    os.makedirs(run_dir, exist_ok=True)
    import json
    with open(os.path.join(run_dir, "test_args.json"), "w") as f:
        json.dump(vars(args), f, indent=4, sort_keys=True, default=str)

    # A2B converts A's utterances using B's stats for decode (test.py:41-54,94-98).
    if args.model_name == "generator_A2B":
        src_id, tgt_id = args.speaker_A_id, args.speaker_B_id
    else:
        src_id, tgt_id = args.speaker_B_id, args.speaker_A_id
    src_mels, src_mean, src_std = load_speaker(args.preprocessed_data_dir, src_id)
    tgt_mels, tgt_mean, tgt_std = load_speaker(args.preprocessed_data_dir, tgt_id)

    gen = Generator(n_mels=args.n_mels, residual_channels=args.residual_channels)
    params = load_generator_params(args.ckpt_dir, args.load_epoch, args.model_name,
                                   args.n_mels, args.residual_channels)

    vocoder = None
    if args.vocoder_ckpt:
        import torch

        from maskcyclegan_vc_tpu.models.melgan import (
            MelGANGenerator,
            melgan_params_from_torch,
        )

        sd = torch.load(args.vocoder_ckpt, map_location="cpu", weights_only=False)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        vocoder = (MelGANGenerator(),
                   jax.tree.map(jnp.asarray, melgan_params_from_torch(sd)))

    out_dir = os.path.join(args.save_dir, args.name,
                           f"converted_audio_{args.load_epoch}")
    os.makedirs(out_dir, exist_ok=True)

    if args.compute_mcd:
        from maskcyclegan_vc_tpu.eval.f0 import utterance_f0
        from maskcyclegan_vc_tpu.eval.mcep import mcd_dtw_wav
        from maskcyclegan_vc_tpu.eval.metrics import (
            mcd_dtw,
            mel_spectral_distance,
        )

    # mel -> waveform decoder for whichever backend is active (MelGAN
    # checkpoint or Griffin-Lim); None = write .npy mels.
    decode_fn = None
    if vocoder is not None:
        from maskcyclegan_vc_tpu.models.melgan import decode_mel

        vg, vp = vocoder

        def decode_fn(mel, mean, std):
            return np.asarray(decode_mel(
                vg, vp, jnp.asarray(mel)[None],
                jnp.asarray(mean), jnp.asarray(std)))[0]
    elif args.griffin_lim:
        from maskcyclegan_vc_tpu.data.griffin_lim import decode_mel_griffin_lim

        def decode_fn(mel, mean, std):
            return decode_mel_griffin_lim(mel, mean, std,
                                          n_iter=args.griffin_lim_iters)

    convert = make_convert_fn(gen)
    mcds, msds, mcd_wavs, f0_conv = [], [], [], []
    for i, mel in enumerate(src_mels):
        fake = convert(params, mel)
        if args.compute_mcd:
            f0_conv.append(utterance_f0(fake, tgt_mean, tgt_std))
        if args.compute_mcd and i < len(tgt_mels):
            # Compare in the vocoder's (denormalized log10-mel) scale.
            fake_db = fake * tgt_std + tgt_mean
            tgt_db = tgt_mels[i] * tgt_std + tgt_mean
            m, path = mcd_dtw(fake_db, tgt_db)
            mcds.append(m)
            msds.append(mel_spectral_distance(fake_db, tgt_db, path))
        stem_c = f"{i}-converted_{src_id}_to_{tgt_id}"
        stem_o = f"{i}-original_{src_id}_to_{tgt_id}"
        if decode_fn is None:
            np.save(os.path.join(out_dir, stem_c + ".npy"), fake)
            np.save(os.path.join(out_dir, stem_o + ".npy"), mel)
        else:
            from maskcyclegan_vc_tpu.data.audio_io import write_wav

            # Target-speaker denorm for the conversion, source stats for
            # the original (reference test.py:94-98).
            wav_c = decode_fn(fake, tgt_mean, tgt_std)
            wav_o = decode_fn(mel, src_mean, src_std)
            write_wav(os.path.join(out_dir, stem_c + ".wav"), wav_c,
                      args.sample_rate)
            write_wav(os.path.join(out_dir, stem_o + ".wav"), wav_o,
                      args.sample_rate)
            if args.compute_mcd and i < len(tgt_mels):
                # Published-convention MCD (order-34 warped cepstra,
                # eval/mcep.py) on waveforms — BOTH sides through the
                # same decoder, so decoder artifacts cancel in the
                # comparison.
                tgt_wav = decode_fn(tgt_mels[i], tgt_mean, tgt_std)
                mw, _ = mcd_dtw_wav(wav_c, tgt_wav, sr=args.sample_rate)
                mcd_wavs.append(mw)
    print(f"wrote {len(src_mels)} conversions to {out_dir}")
    if mcds:
        # log-mel-DCT cepstra, not WORLD/SPTK mel-cepstra: relative metric
        # only, not comparable to the paper's published MCD figures.
        print(f"MCD(log-mel-DCT) {np.mean(mcds):.3f} dB (n={len(mcds)}), "
              f"MSD {np.mean(msds):.3f}")
    if mcd_wavs:
        # SPTK-convention warped cepstra from the decoded waveforms
        # (periodogram-based, eval/mcep.py docstring caveat).
        print(f"MCD(warped-cepstral, wav) {np.mean(mcd_wavs):.3f} dB "
              f"(n={len(mcd_wavs)})")
    if f0_conv:
        # Absolute, comparable complement to the relative MCD: did the
        # conversions land in the target speaker's F0 register?
        from maskcyclegan_vc_tpu.eval.f0 import utterance_f0 as _uf0

        f0_src = float(np.median([_uf0(m, src_mean, src_std)
                                  for m in src_mels]))
        f0_tgt = float(np.median([_uf0(m, tgt_mean, tgt_std)
                                  for m in tgt_mels]))
        print(f"F0 median: source {f0_src:.1f} Hz -> converted "
              f"{float(np.median(f0_conv)):.1f} Hz (target register "
              f"{f0_tgt:.1f} Hz)")


if __name__ == "__main__":
    main()
