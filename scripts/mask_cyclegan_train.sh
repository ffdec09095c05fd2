#!/usr/bin/env bash
# Canonical VCC2SF3 <-> VCC2TF1 training run — same hyperparameters as the
# reference's committed script (/root/reference/bash_scripts/
# mask_cyclegan_train.sh:4-20). Add --continue_train to resume from the
# latest checkpoint. On TPU the defaults already select bfloat16 MXU
# compute, Pallas fused norms, and scan-epoch execution.
set -euo pipefail
cd "$(dirname "$0")/.."

python -m maskcyclegan_vc_tpu.cli.train \
    --name mask_cyclegan_vc_VCC2SF3_VCC2TF1 \
    --seed 0 \
    --save_dir results/ \
    --preprocessed_data_dir vcc2018_preprocessed/vcc2018_training \
    --speaker_A_id VCC2SF3 \
    --speaker_B_id VCC2TF1 \
    --epochs_per_save 100 \
    --epochs_per_plot 10 \
    --num_epochs 6172 \
    --decay_after 2e5 \
    --stop_identity_after 1e4 \
    --batch_size 1 \
    --sample_rate 22050 \
    --num_frames 64 \
    --max_mask_len 25 \
    "$@"
