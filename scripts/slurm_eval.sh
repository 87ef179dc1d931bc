#!/usr/bin/env bash
# Slurm eval-only launcher (reference: scripts/slurm_eval.sh — evaluates a
# checkpoint with --eval bbox segm on one node).
#
# Usage:
#   scripts/slurm_eval.sh PARTITION JOB_NAME CONFIG CHECKPOINT [metrics...]
set -euo pipefail

PARTITION=$1
JOB_NAME=$2
CONFIG=$3
CHECKPOINT=$4
shift 4

METRICS=${*:-"bbox segm"}
SRUN_ARGS=${SRUN_ARGS:-}

srun -p "$PARTITION" \
  --job-name="$JOB_NAME" \
  --nodes=1 \
  --ntasks=1 \
  --kill-on-bad-exit=1 \
  $SRUN_ARGS \
  python "$(dirname "$0")/../test.py" "$CONFIG" "$CHECKPOINT" \
    --eval $METRICS
