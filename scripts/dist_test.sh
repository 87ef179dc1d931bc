#!/usr/bin/env bash
# Multi-device eval launcher (reference: scripts/dist_test.sh, which wraps
# torch.distributed.launch around test.py).
#
# TPU-native: one process drives all local chips; `test.py --devices N`
# runs the data-parallel eval loop (dynamask_tpu/apis/test.py
# multi_device_test, the multi_gpu_test equivalent).
#
# Usage:
#   scripts/dist_test.sh CONFIG CHECKPOINT [NUM_DEVICES] [test.py args...]
set -euo pipefail

CONFIG=$1
CHECKPOINT=$2
# NUM_DEVICES is optional: only consume $3 when it is numeric, so
# `dist_test.sh cfg ckpt --eval bbox` passes the flags through untouched
if [[ $# -ge 3 && $3 =~ ^[0-9]+$ ]]; then
  DEVICES=$3
  shift 3
else
  DEVICES=0
  shift 2
fi

if [[ "$DEVICES" == "0" ]]; then
  DEVICES=$(python -c 'import jax; print(jax.local_device_count())')
fi

exec python "$(dirname "$0")/../test.py" "$CONFIG" "$CHECKPOINT" \
  --devices "$DEVICES" "$@"
