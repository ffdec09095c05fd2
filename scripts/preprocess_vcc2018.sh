#!/usr/bin/env bash
# Preprocess the VCC2018 training + evaluation sets for the demo pair
# (reference README.md:74-88 documents the same two invocations). Runs
# the on-device mel frontend; on multi-device hosts per-speaker stats
# are computed with mesh collectives (parallel/stats.py).
set -euo pipefail
cd "$(dirname "$0")/.."

python -m maskcyclegan_vc_tpu.cli.preprocess \
    --data_directory vcc2018/vcc2018_training \
    --preprocessed_data_directory vcc2018_preprocessed/vcc2018_training \
    --speaker_ids VCC2SF3 VCC2TF1

python -m maskcyclegan_vc_tpu.cli.preprocess \
    --data_directory vcc2018/vcc2018_evaluation \
    --preprocessed_data_directory vcc2018_preprocessed/vcc2018_evaluation \
    --speaker_ids VCC2SF3 VCC2TF1
