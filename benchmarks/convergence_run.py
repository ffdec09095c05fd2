"""Convergence evidence run: real training on TPU + objective scoring.

The reference's reason to exist is "excellent results after only several
hundred epochs" (/root/reference/README.md:90) with a demo checkpoint at
epoch 500 (bash_scripts/mask_cyclegan_test.sh:9). This script produces
the equivalent evidence for this framework, end to end through the REAL
product CLIs (cli.preprocess / train.Trainer / conversion path):

  1. synthesizes a non-parallel 2-speaker training corpus and a parallel
     eval corpus (data/synth.py — speakers differ in F0 register AND
     formant envelope);
  2. preprocesses with the product mel frontend (cli/preprocess.py);
  3. trains the full-size model (24.5M-param generators x2,
     discriminators x4) for --epochs epochs with checkpoints every
     --save_every;
  4. scores every checkpoint objectively: conversion F0 shift
     (eval/f0.py — does a converted A utterance land in B's register?)
     in both directions, DTW-MCD / MSD against the index-paired
     parallel target utterance (eval/metrics.py), and the
     published-convention warped-cepstral MCD (eval/mcep.py) on
     Griffin-Lim-decoded waveforms — converted and target through the
     SAME decoder so its artifacts cancel;
  5. writes one JSON artifact with per-epoch loss curves (parsed from
     the run's .log) + per-checkpoint scores. tests/
     test_convergence_artifact.py asserts the committed artifact's
     invariants.

Usage:
    python benchmarks/convergence_run.py --workdir /tmp/conv --epochs 500 \
        --out benchmarks/convergence_r05.json
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


LOG_RE = re.compile(r"\[epoch (\d+) step (\d+)\] (.*) \(")


def parse_log(path):
    """Per-print-window metric rows from the trainer's .log file."""
    rows = []
    with open(path) as f:
        for line in f:
            m = LOG_RE.match(line)
            if not m:
                continue
            metrics = {}
            for part in m.group(3).split(" "):
                part = part.strip()
                if part.endswith(":"):
                    key = part[:-1]
                elif part:
                    metrics[key] = float(part)
            rows.append({"epoch": int(m.group(1)), "step": int(m.group(2)),
                         **metrics})
    return rows


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", type=str, default="/tmp/convergence_vc")
    p.add_argument("--epochs", type=int, default=500)
    p.add_argument("--save_every", type=int, default=50)
    p.add_argument("--n_train", type=int, default=20)
    p.add_argument("--n_eval", type=int, default=6)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", type=str, default="benchmarks/convergence_r05.json")
    p.add_argument("--keep_ckpts", type=int, default=1,
                   help="checkpoints to keep after scoring (disk hygiene; "
                        "each full-state npz is ~1 GB)")
    p.add_argument("--score_only", type=int, default=0,
                   help="1: skip corpus/preprocess/training and re-score "
                        "the checkpoints already in --workdir (recovery "
                        "path if a previous run died after training)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))

    from maskcyclegan_vc_tpu.cli.preprocess import preprocess_speaker
    from maskcyclegan_vc_tpu.cli.test import load_generator_params, make_convert_fn
    from maskcyclegan_vc_tpu.data.dataset import load_speaker
    from maskcyclegan_vc_tpu.data.griffin_lim import decode_mel_griffin_lim
    from maskcyclegan_vc_tpu.data.synth import make_corpus
    from maskcyclegan_vc_tpu.eval.f0 import utterance_f0
    from maskcyclegan_vc_tpu.eval.mcep import mcd_dtw_wav
    from maskcyclegan_vc_tpu.eval.metrics import mcd_dtw, mel_spectral_distance
    from maskcyclegan_vc_tpu.io.checkpoint import checkpoint_path
    from maskcyclegan_vc_tpu.models import Generator
    from maskcyclegan_vc_tpu.train.trainer import Trainer, TrainerArgs

    A, B = "VCC2SF3", "VCC2TF1"
    wav_train = os.path.join(args.workdir, "wavs_train")
    wav_eval = os.path.join(args.workdir, "wavs_eval")
    pre_train = os.path.join(args.workdir, "pre_train")
    pre_eval = os.path.join(args.workdir, "pre_eval")
    results = os.path.join(args.workdir, "results")
    run_name = "convergence"

    t0 = time.time()
    if not args.score_only:
        print("[1/4] synthesizing corpora", flush=True)
        make_corpus(wav_train, n_utts=args.n_train, seed=args.seed,
                    parallel=False)
        make_corpus(wav_eval, n_utts=args.n_eval, seed=args.seed + 1,
                    parallel=True)

        print("[2/4] preprocessing (product mel frontend)", flush=True)
        for sid in (A, B):
            preprocess_speaker(wav_train, pre_train, sid)
            preprocess_speaker(wav_eval, pre_eval, sid)

    print("[3/4] training", flush=True)
    targs = TrainerArgs(
        name=run_name, save_dir=results, seed=args.seed,
        speaker_A_id=A, speaker_B_id=B,
        preprocessed_data_dir=pre_train,
        num_epochs=args.epochs, batch_size=1, num_frames=64, max_mask_len=25,
        # Canonical schedule shape scaled to this run length: identity
        # term active for the first ~30% of steps, LR decay over the
        # last ~30% (reference: 1e4 of 5e5 steps identity, decay from
        # 2e5 — at 500 synthetic epochs the reference constants would
        # never trigger, hiding both schedule paths from the artifact).
        stop_identity_after=args.epochs * args.n_train * 3 // 10,
        decay_after=args.epochs * args.n_train * 7 // 10,
        epochs_per_save=args.save_every,
        epochs_per_plot=10 ** 9,  # no TB plots; scoring below instead
        steps_per_print=args.n_train,  # one .log line per epoch
        max_ckpts=0,
    )
    if args.score_only:
        print("    (score_only: reusing existing checkpoints)", flush=True)
    else:
        trainer = Trainer(targs)
        trainer.train()
    train_s = time.time() - t0
    print(f"    training wall time {train_s:.1f}s", flush=True)

    print("[4/4] scoring checkpoints", flush=True)
    eval_A = load_speaker(pre_eval, A)
    eval_B = load_speaker(pre_eval, B)
    mels_A, mean_A, std_A = eval_A
    mels_B, mean_B, std_B = eval_B

    # Source/target reference registers, measured on the eval corpus.
    f0_src_A = [utterance_f0(m, mean_A, std_A) for m in mels_A]
    f0_src_B = [utterance_f0(m, mean_B, std_B) for m in mels_B]

    gen = Generator()
    convert = make_convert_fn(gen)
    ckpt_dir = os.path.join(results, run_name, "ckpts")
    epochs = list(range(args.save_every, args.epochs + 1, args.save_every))
    checkpoints = []
    for ep in epochs:
        row = {"epoch": ep}
        for direction, src, tgt in (
            ("A2B", (mels_A, mean_A, std_A), (mels_B, mean_B, std_B, f0_src_B)),
            ("B2A", (mels_B, mean_B, std_B), (mels_A, mean_A, std_A, f0_src_A)),
        ):
            params = load_generator_params(
                ckpt_dir, ep, f"generator_{direction}")
            s_mels, s_mean, s_std = src
            t_mels, t_mean, t_std, t_f0 = tgt
            f0_conv, mcds, msds, mcd_wavs = [], [], [], []
            for i, mel in enumerate(s_mels):
                fake = convert(params, mel)
                f0_conv.append(utterance_f0(fake, t_mean, t_std))
                # Parallel eval corpus: index-paired target is the same
                # "sentence" in the target voice.
                fake_db = fake * t_std + t_mean
                tgt_db = t_mels[i] * t_std + t_mean
                m, path = mcd_dtw(fake_db, tgt_db)
                mcds.append(m)
                msds.append(mel_spectral_distance(fake_db, tgt_db, path))
                # Published-convention MCD: order-34 warped cepstra on
                # waveforms, both sides through the same GL decoder.
                wav_c = decode_mel_griffin_lim(fake, t_mean, t_std,
                                               n_iter=24)
                wav_t = decode_mel_griffin_lim(t_mels[i], t_mean, t_std,
                                               n_iter=24)
                mw, _ = mcd_dtw_wav(wav_c, wav_t)
                mcd_wavs.append(mw)
            row[direction] = {
                "f0_converted_median": float(np.median(f0_conv)),
                "f0_converted_all": [round(f, 2) for f in f0_conv],
                "mcd_mean": float(np.mean(mcds)),
                "msd_mean": float(np.mean(msds)),
                "mcd_wav_mean": float(np.mean(mcd_wavs)),
            }
            print(f"    epoch {ep} {direction}: "
                  f"f0 {row[direction]['f0_converted_median']:.1f} Hz, "
                  f"MCD {row[direction]['mcd_mean']:.3f} dB, "
                  f"MCD-wav {row[direction]['mcd_wav_mean']:.3f} dB",
                  flush=True)
        checkpoints.append(row)

    log_rows = parse_log(os.path.join(results, run_name, f"{run_name}.log"))

    artifact = {
        "framework": "maskcyclegan_vc_tpu",
        "device": str(jax.devices()[0]),
        "seed": args.seed,
        "epochs": args.epochs,
        "steps_per_epoch": args.n_train,
        "train_wall_s": round(train_s, 1),
        "schedule": {
            "stop_identity_after": targs.stop_identity_after,
            "decay_after": targs.decay_after,
        },
        "corpus": {
            "train_utts_per_speaker": args.n_train,
            "eval_utts_per_speaker": args.n_eval,
            "speakers": {
                "A": {"id": A, "f0_measured_median":
                      float(np.median(f0_src_A))},
                "B": {"id": B, "f0_measured_median":
                      float(np.median(f0_src_B))},
            },
        },
        "loss_curves": log_rows,
        "checkpoints": checkpoints,
    }
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"wrote {args.out}", flush=True)

    # Disk hygiene: full-state checkpoints are ~1 GB each.
    if args.keep_ckpts >= 0:
        from maskcyclegan_vc_tpu.io.checkpoint import rotate_checkpoints

        rotate_checkpoints(ckpt_dir, max(1, args.keep_ckpts))


if __name__ == "__main__":
    main()
