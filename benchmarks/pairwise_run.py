"""BASELINE config 4 driven for real: pairwise launcher -> train -> test.

The reference's end-to-end scope is "all 12 VCC2018 speakers pairwise"
(/root/reference/README.md:49,77); job-level sharding over hosts is this
framework's decomposition for it (cli/launch_pairwise.py). This script
drives that path end to end on the real chip over 3 synthetic speakers
(3 pair jobs: the full pairwise matrix at N=3):

  1. synthesize + preprocess a 3-speaker corpus (data/synth.py);
  2. ``cli.launch_pairwise`` over all 3 pairs (subprocess per job —
     exactly the production pod layout, one job per host slot);
  3. ``cli.test`` conversion for every pair (A2B direction);
  4. assert checkpoints + conversions exist per pair and write
     benchmarks/pairwise_r05.json.

Usage: python benchmarks/pairwise_run.py [--epochs 2] [--out ...]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", type=str, default="/tmp/pairwise_vc")
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--n_utts", type=int, default=4)
    p.add_argument("--out", type=str, default="benchmarks/pairwise_r05.json")
    p.add_argument("--residual_channels", type=int, default=256)
    args = p.parse_args()

    from maskcyclegan_vc_tpu.cli.launch_pairwise import main as launch_main
    from maskcyclegan_vc_tpu.cli.preprocess import preprocess_speaker
    from maskcyclegan_vc_tpu.cli.test import main as test_main
    from maskcyclegan_vc_tpu.data.synth import DEFAULT_SPEAKERS, make_corpus

    speakers = ["VCC2SF3", "VCC2TF1", "VCC2SM3"]
    wavs = os.path.join(args.workdir, "wavs")
    pre = os.path.join(args.workdir, "pre")
    save = os.path.join(args.workdir, "results")

    t0 = time.time()
    make_corpus(wavs, speakers={s: DEFAULT_SPEAKERS[s] for s in speakers},
                n_utts=args.n_utts, seed=2)
    for sid in speakers:
        preprocess_speaker(wavs, pre, sid)

    launch_main([
        "--preprocessed_data_dir", pre,
        "--speaker_ids", *speakers,
        "--save_dir", save,
        "--",
        "--num_epochs", str(args.epochs),
        "--batch_size", "1",
        "--epochs_per_save", str(args.epochs),
        "--epochs_per_plot", "100000",
        "--steps_per_print", "1",
        "--residual_channels", str(args.residual_channels),
    ])

    pairs = [("VCC2SF3", "VCC2SM3"), ("VCC2SF3", "VCC2TF1"),
             ("VCC2SM3", "VCC2TF1")]  # sorted combinations of the 3
    rows = []
    for a, b in pairs:
        name = f"mask_cyclegan_vc_{a}_{b}"
        ckpt_dir = os.path.join(save, name, "ckpts")
        ckpts = sorted(glob.glob(os.path.join(ckpt_dir, "*_state.npz")))
        assert ckpts, f"no checkpoint for pair {a}<->{b}"
        test_main([
            "--name", name,
            "--save_dir", save,
            "--preprocessed_data_dir", pre,
            "--speaker_A_id", a, "--speaker_B_id", b,
            "--ckpt_dir", ckpt_dir,
            "--load_epoch", str(args.epochs),
            "--model_name", "generator_A2B",
            "--residual_channels", str(args.residual_channels),
        ])
        conv_dir = os.path.join(save, name, f"converted_audio_{args.epochs}")
        convs = sorted(glob.glob(os.path.join(conv_dir, "*-converted_*.npy")))
        assert len(convs) == args.n_utts, (a, b, convs)
        for c in convs[:1]:
            assert np.isfinite(np.load(c)).all()
        rows.append({
            "pair": f"{a}<->{b}",
            "checkpoints": [os.path.basename(c) for c in ckpts],
            "conversions": len(convs),
        })
        print(f"pair {a}<->{b}: {len(ckpts)} ckpts, {len(convs)} conversions",
              flush=True)

    import jax

    artifact = {
        "config": "BASELINE 4 (pairwise job sharding), 3 speakers = 3 pair jobs",
        "device": str(jax.devices()[0]),
        "epochs_per_pair": args.epochs,
        "residual_channels": args.residual_channels,
        "wall_s": round(time.time() - t0, 1),
        "pairs": rows,
    }
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"wrote {args.out} ({artifact['wall_s']}s total)")


if __name__ == "__main__":
    main()
