"""Matched-seed training-curve comparison vs the torch reference, 40 steps.

The default test suite pins a 5-step small-R trajectory
(tests/test_trajectory_parity.py) and RUN_SLOW pins 3 full-size steps
(tests/test_dynamics_parity.py). This script extends the evidence BEYOND
those windows: 40 iterations of our jitted step vs a literal
re-execution of the reference loop (tests/_torch_ref.py re-drives
/root/reference/mask_cyclegan_vc/train.py:195-315 against the
reference's own nn.Modules), at matched weights, on identical batches
cropped from the synthetic speech corpus (data/synth.py — real mel
statistics, not white noise), crossing both schedule boundaries
(LR-decay onset at step 20, identity cutoff at step 10).

Writes benchmarks/curve_compare_r05.json with both loss curves and the
per-step relative deviation; tests/test_convergence_artifact.py asserts
its invariants. Runs on CPU in a few minutes (small-R oracle).

Usage: python benchmarks/curve_compare.py [--steps 40] [--out ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, "/root/reference")

import numpy as np

R = 8
DECAY_AFTER = 20
STOP_IDENTITY_AFTER = 10


def make_batches(n_steps, n_frames=64, seed=11):
    """Batches cropped from normalized synthetic-speech mels."""
    import jax.numpy as jnp

    from maskcyclegan_vc_tpu.data.melspec import log_mel_spectrogram
    from maskcyclegan_vc_tpu.data.synth import (
        DEFAULT_SPEAKERS,
        make_content,
        synth_utterance,
    )

    rs = np.random.RandomState(seed)
    mels = {}
    for sid in ("VCC2SF3", "VCC2TF1"):
        utts = []
        for _ in range(4):
            wav = synth_utterance(DEFAULT_SPEAKERS[sid], make_content(rs),
                                  noise_seed=rs.randint(2**31))
            utts.append(np.asarray(log_mel_spectrogram(
                jnp.asarray(wav)[None], use_fft=True))[0])
        cat = np.concatenate(utts, axis=1)
        mean = cat.mean(axis=1, keepdims=True)
        std = cat.std(axis=1, keepdims=True) + 1e-9
        mels[sid] = [(u - mean) / std for u in utts]

    batches = []
    for i in range(n_steps):
        b = {}
        for key, sid in (("A", "VCC2SF3"), ("B", "VCC2TF1")):
            u = mels[sid][rs.randint(len(mels[sid]))]
            s = rs.randint(u.shape[1] - n_frames + 1)
            crop = u[:, s:s + n_frames].astype(np.float32)[None]
            mask = np.ones_like(crop)
            # FIF mask, reference distributions (vc_dataset.py:49-66).
            msz = rs.randint(0, 25)
            ms = rs.randint(0, n_frames - msz + 1)
            mask[:, :, ms:ms + msz] = 0.0
            b[f"real_{key}"] = crop
            b[f"mask_{key}"] = mask
        batches.append(b)
    return batches


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=40)
    p.add_argument("--out", type=str,
                   default="benchmarks/curve_compare_r05.json")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import torch

    from mask_cyclegan_vc.model import Discriminator as RefD
    from mask_cyclegan_vc.model import Generator as RefG

    from maskcyclegan_vc_tpu.io.torch_import import (
        discriminator_params_from_torch,
        generator_params_from_torch,
    )
    from maskcyclegan_vc_tpu.train.schedules import ScheduleConfig
    from maskcyclegan_vc_tpu.train.state import TrainConfig, create_train_state
    from maskcyclegan_vc_tpu.train.step import make_train_step
    from tests._torch_ref import ref_generator_forward, torch_reference_trajectory

    torch.manual_seed(0)
    gA2B, gB2A = RefG(residual_in_channels=R), RefG(residual_in_channels=R)
    dA, dB, dA2, dB2 = (RefD(residual_in_channels=R) for _ in range(4))
    g_opt = torch.optim.Adam(
        list(gA2B.parameters()) + list(gB2A.parameters()), lr=2e-4,
        betas=(0.5, 0.999))
    d_opt = torch.optim.Adam(
        list(dA.parameters()) + list(dB.parameters())
        + list(dA2.parameters()) + list(dB2.parameters()), lr=1e-4,
        betas=(0.5, 0.999))

    sched = ScheduleConfig(
        num_epochs=args.steps, n_samples=1, batch_size=1,
        decay_after=DECAY_AFTER, stop_identity_after=STOP_IDENTITY_AFTER,
        ref_compat_lr=False)
    cfg = TrainConfig(schedule=sched, residual_channels=R, precision="highest")
    state = create_train_state(cfg, seed=0)
    state = state.replace(
        g_params={
            "A2B": jax.tree.map(jnp.asarray,
                                generator_params_from_torch(gA2B.state_dict())),
            "B2A": jax.tree.map(jnp.asarray,
                                generator_params_from_torch(gB2A.state_dict())),
        },
        d_params={
            k: jax.tree.map(jnp.asarray, discriminator_params_from_torch(
                m.state_dict()))
            for k, m in (("A", dA), ("B", dB), ("A2", dA2), ("B2", dB2))
        },
    )

    batches = make_batches(args.steps)

    step_fns = {}
    ours = []
    for i, b in enumerate(batches):
        wi = i <= STOP_IDENTITY_AFTER  # trainer's executable switch
        if wi not in step_fns:
            step_fns[wi] = jax.jit(make_train_step(cfg, with_identity=wi))
        state, metrics = step_fns[wi](state, {k: jnp.asarray(v)
                                              for k, v in b.items()})
        ours.append([float(metrics["g_loss"]), float(metrics["d_loss"])])
        print(f"step {i}: ours g={ours[-1][0]:.5f} d={ours[-1][1]:.5f}",
              flush=True)

    theirs = [list(t) for t in torch_reference_trajectory(
        (gA2B, gB2A, dA, dB, dA2, dB2), (g_opt, d_opt), batches,
        generator_lr=2e-4, discriminator_lr=1e-4, total_steps=args.steps,
        decay_after=DECAY_AFTER, stop_identity_after=STOP_IDENTITY_AFTER,
        ref_compat=False, gen_forward=ref_generator_forward)]

    o = np.asarray(ours)
    t = np.asarray(theirs)
    rel = np.abs(o - t) / (np.abs(t) + 1e-6)
    out = {
        "steps": args.steps,
        "residual_channels": R,
        "decay_after": DECAY_AFTER,
        "stop_identity_after": STOP_IDENTITY_AFTER,
        "columns": ["g_loss", "d_loss"],
        "ours": ours,
        "torch_reference": theirs,
        "rel_deviation_max": float(rel.max()),
        "rel_deviation_mean": float(rel.mean()),
        "rel_deviation_final_step": [float(r) for r in rel[-1]],
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"max rel deviation over {args.steps} steps: {rel.max():.2e}")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
