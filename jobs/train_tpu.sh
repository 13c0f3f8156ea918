#!/usr/bin/env bash
# Single-host TPU training launch (equivalent of the reference's per-scene
# SLURM jobs, /root/reference/jobs/run_job_bearPNG_001.job — 1 GPU, 24h).
# Usage: jobs/train_tpu.sh CASE [CONF] [EXTRA_ARGS...]
set -euo pipefail

CASE="${1:?usage: train_tpu.sh CASE [CONF] [extra args]}"
CONF="${2:-./confs/wmask_rnb.conf}"
shift || true; shift || true

REPO="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="${REPO}:${PYTHONPATH:-}"

LOG_DIR="${REPO}/exp/${CASE}/logs_launch"
mkdir -p "${LOG_DIR}"
STAMP="$(date +%Y%m%d_%H%M%S)"

python "${REPO}/exp_runner.py" \
    --mode train_rnb \
    --conf "${CONF}" \
    --case "${CASE}" \
    "$@" 2>&1 | tee "${LOG_DIR}/train_${STAMP}.log"
