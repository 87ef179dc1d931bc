#!/usr/bin/env bash
# Slurm eval launcher (reference: scripts/slurm_test.sh — srun gang launch
# around test.py).
#
# TPU-native: eval is single-controller data-parallel over the local chips
# (test.py --devices); multi-host eval shards the dataset per process and
# host-gathers results (dynamask_tpu/apis/test.py).
#
# Usage:
#   scripts/slurm_test.sh PARTITION JOB_NAME CONFIG CHECKPOINT [args...]
set -euo pipefail

PARTITION=$1
JOB_NAME=$2
CONFIG=$3
CHECKPOINT=$4
shift 4

NODES=${NODES:-1}
SRUN_ARGS=${SRUN_ARGS:-}

srun -p "$PARTITION" \
  --job-name="$JOB_NAME" \
  --nodes="$NODES" \
  --ntasks="$NODES" \
  --ntasks-per-node=1 \
  --kill-on-bad-exit=1 \
  $SRUN_ARGS \
  python "$(dirname "$0")/../test.py" "$CONFIG" "$CHECKPOINT" "$@"
