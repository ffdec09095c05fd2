"""Train CLI. Flag names mirror the reference parsers (SURVEY §5.6).

    python -m maskcyclegan_vc_tpu.cli.train \
        --name mask_cyclegan_vc_VCC2SF3_VCC2TF1 \
        --seed 0 --save_dir results/ \
        --preprocessed_data_dir vcc2018_preprocessed/vcc2018_training \
        --speaker_A_id VCC2SF3 --speaker_B_id VCC2TF1 \
        --num_epochs 6172 --batch_size 1 --num_frames 64 --max_mask_len 25 \
        --decay_after 200000 --epochs_per_save 100 --epochs_per_plot 10

TPU-specific additions: --dtype (auto = bfloat16 MXU compute on TPU),
--fused_norms (auto = Pallas fused IN(+gate) epilogues on TPU), --remat,
--ref_compat_lr (reproduce the reference's LR-decay bug for
matched-dynamics runs), --vocoder_ckpt (torch melgan weights for in-loop
audio logging), --grad_allreduce_dtype bfloat16 (compressed-wire
gradient psums for cross-slice DCN data parallelism), --async_save
(checkpoint file writes overlapped with training, default on),
--finite_check (NaN sanitizer cadence, SURVEY §5.2). The defaults give
the benchmarked fast path on TPU with no extra flags.
"""

from __future__ import annotations

import argparse
import dataclasses

import numpy as np

from maskcyclegan_vc_tpu.train.trainer import Trainer, TrainerArgs


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    d = TrainerArgs()
    p.add_argument("--name", type=str, default=d.name)
    p.add_argument("--save_dir", type=str, default=d.save_dir)
    p.add_argument("--seed", type=int, default=d.seed)
    p.add_argument("--speaker_A_id", type=str, default=d.speaker_A_id)
    p.add_argument("--speaker_B_id", type=str, default=d.speaker_B_id)
    p.add_argument("--preprocessed_data_dir", type=str,
                   default=d.preprocessed_data_dir)
    p.add_argument("--num_epochs", type=int, default=d.num_epochs)
    p.add_argument("--batch_size", type=int, default=d.batch_size)
    p.add_argument("--num_frames", type=int, default=d.num_frames)
    p.add_argument("--num_frames_validation", type=int, default=320,
                   help="accepted for reference CLI compatibility and "
                        "intentionally ignored: validation always uses "
                        "full utterances, exactly like the reference "
                        "(its valid-mode VCDataset ignores n_frames — "
                        "cycleGAN_train_arg_parser.py:44-46, "
                        "vc_dataset.py:24-28; SURVEY Appendix A.9)")
    p.add_argument("--max_mask_len", type=int, default=d.max_mask_len)
    p.add_argument("--generator_lr", type=float, default=d.generator_lr)
    p.add_argument("--discriminator_lr", type=float, default=d.discriminator_lr)
    p.add_argument("--decay_after", type=float, default=d.decay_after)
    p.add_argument("--stop_identity_after", type=float,
                   default=d.stop_identity_after)
    p.add_argument("--cycle_loss_lambda", type=float, default=d.cycle_loss_lambda)
    p.add_argument("--identity_loss_lambda", type=float,
                   default=d.identity_loss_lambda)
    p.add_argument("--epochs_per_save", type=int, default=d.epochs_per_save)
    p.add_argument("--epochs_per_plot", type=int, default=d.epochs_per_plot)
    p.add_argument("--steps_per_print", type=int, default=d.steps_per_print)
    p.add_argument("--max_ckpts", type=int, default=d.max_ckpts)
    p.add_argument("--continue_train", action="store_true")
    p.add_argument("--ref_compat_lr", action="store_true")
    p.add_argument("--n_mels", type=int, default=d.n_mels)
    p.add_argument("--residual_channels", type=int, default=d.residual_channels)
    p.add_argument("--dtype", choices=["auto", "float32", "bfloat16"],
                   default=d.dtype,
                   help="compute dtype; auto = bfloat16 on TPU, float32 "
                        "elsewhere")
    p.add_argument("--precision", type=str, default=None)
    p.add_argument("--fused_norms", choices=["auto", "0", "1"],
                   default=d.fused_norms,
                   help="Pallas fused IN(+gate) epilogues; auto = on for TPU")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize generator forwards in the G step "
                        "(trade FLOPs for HBM)")
    p.add_argument("--scan_epochs", type=int, choices=[0, 1],
                   default=int(d.scan_epochs),
                   help="single-device: run each epoch as one lax.scan "
                        "device program (removes per-step host dispatch)")
    p.add_argument("--sample_rate", type=int, default=d.sample_rate)
    p.add_argument("--vocoder_ckpt", type=str, default=None)
    p.add_argument("--plot_audio", choices=["auto", "off"],
                   default=d.plot_audio,
                   help="TB audio at plot cadence: auto = MelGAN with "
                        "--vocoder_ckpt else Griffin-Lim; off disables")
    p.add_argument("--distributed", action="store_true",
                   help="wire jax.distributed for multi-host pods "
                        "(auto-discovers on TPU; see parallel/dist.py)")
    p.add_argument("--async_save", type=int, choices=[0, 1],
                   default=int(d.async_save),
                   help="overlap checkpoint file writes with training "
                        "(atomicity unchanged; 0 = synchronous saves)")
    p.add_argument("--finite_check", choices=["off", "metrics", "params"],
                   default=d.finite_check,
                   help="NaN/Inf sanitizer cadence (utils/debug.py): "
                        "metrics = raise at epoch end if a logged loss "
                        "went non-finite (free — scalars are already "
                        "fetched); params = also sweep the full state "
                        "before every checkpoint write so a diverged "
                        "run never overwrites its last good checkpoint")
    p.add_argument("--grad_allreduce_dtype",
                   choices=["float32", "bfloat16"],
                   default=d.grad_allreduce_dtype or "float32",
                   help="wire dtype for the data-parallel gradient "
                        "all-reduce; bfloat16 halves the collective "
                        "bytes for bandwidth-limited (cross-slice DCN) "
                        "links via the explicit shard_map path "
                        "(parallel/mesh.make_shardmap_train_step)")
    return p


def print_options(args) -> str:
    """Resolved-flag startup dump, reference format
    (args/base_arg_parser.py:147-163)."""
    lines = ["----------------- Options ---------------"]
    for k, v in sorted(vars(args).items()):
        lines.append("{:>25}: {:<30}".format(str(k), str(v)))
    lines.append("----------------- End -------------------")
    return "\n".join(lines)


def main(argv=None):
    from maskcyclegan_vc_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    args = build_parser().parse_args(argv)
    print(print_options(args), flush=True)
    if args.distributed:
        from maskcyclegan_vc_tpu.parallel.dist import initialize

        initialize()
    np.random.seed(args.seed)
    targs = TrainerArgs(**{
        f.name: getattr(args, f.name) for f in dataclasses.fields(TrainerArgs)
    })
    targs.decay_after = int(targs.decay_after)
    targs.stop_identity_after = int(targs.stop_identity_after)
    Trainer(targs).train()


if __name__ == "__main__":
    main()
