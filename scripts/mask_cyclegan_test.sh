#!/usr/bin/env bash
# Canonical conversion run at the demo epoch — same arguments as the
# reference's committed script (/root/reference/bash_scripts/
# mask_cyclegan_test.sh:1-10). Pass --vocoder_ckpt <melgan.pt> to decode
# waveforms; without it, converted mels are written as .npy.
set -euo pipefail
cd "$(dirname "$0")/.."

python -m maskcyclegan_vc_tpu.cli.test \
    --name mask_cyclegan_vc_VCC2SF3_VCC2TF1 \
    --save_dir results/ \
    --preprocessed_data_dir vcc2018_preprocessed/vcc2018_evaluation \
    --speaker_A_id VCC2SF3 \
    --speaker_B_id VCC2TF1 \
    --ckpt_dir results/mask_cyclegan_vc_VCC2SF3_VCC2TF1/ckpts \
    --load_epoch 500 \
    --model_name generator_A2B \
    "$@"
