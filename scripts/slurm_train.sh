#!/usr/bin/env bash
# SLURM launcher (reference: tools/scripts/slurm_train.sh). Rank/world/
# coordinator are derived from SLURM_* inside init_distributed('slurm'),
# exactly like the reference's init_dist_slurm (common_utils.py:156-170).
#
# Usage: sbatch/srun scripts/slurm_train.sh <partition> <ntasks> <cfg_file> [args...]
set -euo pipefail
PARTITION=$1; NTASKS=$2; CFG=$3; shift 3 || true
exec srun -p "$PARTITION" -n "$NTASKS" --ntasks-per-node=1 \
    python -m seevcn_tpu.cli.train_detector \
    --cfg_file "$CFG" --launcher slurm "$@"
