#!/usr/bin/env bash
# Multi-host detector training on a TPU pod slice.
#
# Reference analog: detector3d/tools/scripts/dist_train.sh (torch.distributed
# .launch --nproc_per_node) — on TPU there is no per-device process fan-out:
# run THIS script once per host (e.g. `gcloud compute tpus tpu-vm ssh
# --worker=all --command=...`); jax.distributed.initialize() self-describes
# on Cloud TPU (--launcher auto), and each process drives its local chips of
# one global SPMD program.
#
# Usage: scripts/pod_train.sh <cfg_file> [extra train_detector args...]
set -euo pipefail
CFG=$1; shift || true
exec python -m seevcn_tpu.cli.train_detector \
    --cfg_file "$CFG" --launcher auto "$@"
