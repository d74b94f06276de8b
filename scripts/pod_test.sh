#!/usr/bin/env bash
# Multi-host evaluation on a TPU pod slice (reference: tools/scripts/
# dist_test.sh). Run once per host; eval frames are sharded per process and
# merged with a process allgather (parallel/collectives.py) instead of the
# reference's tmpdir pickle gather.
#
# Usage: scripts/pod_test.sh <cfg_file> <ckpt> [extra test_detector args...]
set -euo pipefail
CFG=$1; CKPT=$2; shift 2 || true
exec python -m seevcn_tpu.cli.test_detector \
    --cfg_file "$CFG" --ckpt "$CKPT" --launcher auto "$@"
