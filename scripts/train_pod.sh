#!/usr/bin/env bash
# Multi-host TPU pod launch for maskcyclegan_vc_tpu (SURVEY §5.8).
#
# One process per host, all local chips per process — the standard JAX
# pod pattern. On Cloud TPU VMs jax.distributed auto-discovers the
# coordinator, so the same command runs on every worker:
#
#   gcloud compute tpus tpu-vm ssh "$TPU_NAME" --worker=all --command \
#     "cd $REPO_DIR && bash scripts/train_pod.sh --name my_run ..."
#
# For non-TPU fleets (or manual bring-up) export JAX_COORDINATOR_ADDRESS,
# JAX_NUM_PROCESSES, and JAX_PROCESS_ID before invoking; parallel/dist.py
# picks them up.
#
# All arguments are forwarded to the train CLI. The global batch is
# seed-stable for any host count (each host samples the same global
# batch from the folded step key and contributes only its own rows), so
# scaling runs are apples-to-apples with single-host runs.
#
# Spanning multiple pod slices (gradient all-reduce rides DCN instead of
# ICI)? Add --grad_allreduce_dtype bfloat16 — halves the collective
# bytes via the explicit shard_map path (COVERAGE.md scaling roofline).
set -euo pipefail
cd "$(dirname "$0")/.."
# Pod launches must come up multi-process — refuse to run as N silent solo
# trainers (parallel/dist.py asserts process_count > 1). For a deliberate
# single-host run, export MASKVC_REQUIRE_MULTIHOST=0 first.
export MASKVC_REQUIRE_MULTIHOST="${MASKVC_REQUIRE_MULTIHOST:-1}"
exec python -m maskcyclegan_vc_tpu.cli.train --distributed "$@"
