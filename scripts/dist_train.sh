#!/usr/bin/env bash
# Multi-device training launcher (reference: scripts/dist_train.sh:15-16,
# which wraps torch.distributed.launch --nproc_per_node).
#
# TPU-native equivalent: JAX is single-controller — one process drives every
# chip attached to the host, so single-host "distributed" training needs no
# launcher at all; the train step is pjit-sharded over the local mesh
# (dynamask_tpu/apis/train.py builds the mesh from jax.local_devices()).
#
# Usage:
#   scripts/dist_train.sh CONFIG [train.py args...]
#
# For a multi-host TPU pod slice, run this same script on every worker
# (e.g. `gcloud compute tpus tpu-vm ssh $TPU --worker=all --command=...`);
# jax.distributed.initialize() inside train.py (--launcher jax) picks up the
# pod topology from the TPU runtime automatically.
set -euo pipefail

CONFIG=$1
shift

LAUNCHER=none
# Multi-host pods expose these; switch on jax.distributed init when present.
if [[ -n "${JAX_COORDINATOR_ADDRESS:-}" || -n "${TPU_WORKER_HOSTNAMES:-}" ]]; then
  LAUNCHER=jax
fi

exec python "$(dirname "$0")/../train.py" "$CONFIG" --launcher "$LAUNCHER" "$@"
