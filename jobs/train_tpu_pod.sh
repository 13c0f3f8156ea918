#!/usr/bin/env bash
# Multi-host TPU pod-slice training launch. Run this same script on every host
# of the slice (e.g. via `gcloud compute tpus tpu-vm ssh --worker=all`). The
# hosts join one JAX distributed job (jax.distributed.initialize reads the TPU
# metadata automatically on Cloud TPU; set RNB_DISTRIBUTED=1 to force init),
# the global device mesh shards the ray batch across every chip, and gradient
# psums ride ICI.
#
# Usage: jobs/train_tpu_pod.sh CASE [CONF] [EXTRA_ARGS...]
#
# Memory scaling: add `--set train.view_shard=true` and each process loads
# from disk ONLY the views its devices own (parallel/data.py per-host
# loader; proven by tests/test_multihost.py) — dataset size then scales
# with the slice instead of being capped by one host/chip.
set -euo pipefail

CASE="${1:?usage: train_tpu_pod.sh CASE [CONF] [extra args]}"
CONF="${2:-./confs/wmask_rnb.conf}"
shift || true; shift || true

REPO="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="${REPO}:${PYTHONPATH:-}"
export RNB_DISTRIBUTED=1

python "${REPO}/exp_runner.py" \
    --mode train_rnb \
    --conf "${CONF}" \
    --case "${CASE}" \
    --shard auto \
    "$@"
