#!/usr/bin/env bash
# 2-process multi-host demo on ONE machine (no TPU pod needed): each process
# gets 2 virtual CPU devices; the jitted train step runs as one 4-device
# SPMD program across both processes. This is the same path
# tests/test_multihost.py exercises.
#
# Usage: scripts/multiprocess_cpu_demo.sh <cfg_file> [args...]
set -euo pipefail
CFG=$1; shift || true
PORT=${PORT:-29512}
export XLA_FLAGS="--xla_force_host_platform_device_count=2"
export JAX_PLATFORMS=cpu
export JAX_COORDINATOR_ADDRESS=127.0.0.1:$PORT
export JAX_NUM_PROCESSES=2

JAX_PROCESS_ID=0 python -m seevcn_tpu.cli.train_detector \
    --cfg_file "$CFG" --launcher jax "$@" &
PID0=$!
JAX_PROCESS_ID=1 python -m seevcn_tpu.cli.train_detector \
    --cfg_file "$CFG" --launcher jax "$@"
wait $PID0
