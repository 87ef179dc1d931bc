#!/usr/bin/env bash
# Slurm training launcher (reference: scripts/slurm_train.sh:23-31 — srun
# gang launch, one task per GPU, --kill-on-bad-exit=1).
#
# TPU-native: one task per HOST (not per chip — JAX drives all local chips
# from one process). jax.distributed.initialize() auto-detects the Slurm
# cluster (SLURM_JOB_ID / SLURM_STEP_NODELIST) for coordinator discovery.
#
# Usage:
#   scripts/slurm_train.sh PARTITION JOB_NAME CONFIG WORK_DIR [srun args...]
set -euo pipefail

PARTITION=$1
JOB_NAME=$2
CONFIG=$3
WORK_DIR=$4
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
  python "$(dirname "$0")/../train.py" "$CONFIG" \
    --work-dir "$WORK_DIR" --launcher jax "$@"
