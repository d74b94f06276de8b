#!/bin/bash
# Round-5 runbook part 4: final captures once runbook3 releases the chip.
#  1. on-chip maskpath re-measure with the base ckpt + r5 VCN + mask-core
#     cluster voting (the guard-only number was 0.672; core voting is the
#     frame-0 wrong-instance fix) -> runs/maskpath_core_r5.log
#  2. maskpath with the hard-HTC ckpt if runbook2's attempt didn't land
#  3. clean bench capture with the fixed (pre-staged-input) canary
#     -> runs/bench_r5b.json
set -u
cd /root/repo
LOG=runs/r5_runbook4.log
say() { echo "$(date +%H:%M:%S) $*" | tee -a "$LOG"; }

wait_backend() {
  for i in $(seq 1 300); do
    if timeout 90 python -c "import jax; assert jax.devices()" 2>/dev/null; then
      return 0
    fi
    sleep 60
  done
  return 1
}

RB_PID=$(cat /tmp/r5_runbook3.pid 2>/dev/null || echo 0)
say "waiting for r5_runbook3 (pid $RB_PID)..."
for i in $(seq 1 700); do
  kill -0 "$RB_PID" 2>/dev/null || break
  sleep 60
done
say "r5_runbook3 done; starting part 4"
wait_backend || { say "backend never returned"; exit 1; }

VCNM=runs/vcn_r5/ckpt-best.pkl
[ -f "$VCNM" ] || VCNM=runs/vcn_da/ckpt-best.pkl

# 1) base ckpt + core voting, on chip
for att in 1 2; do
  [ -f runs/maskpath_core_r5.log ] && grep -q SUMMARY runs/maskpath_core_r5.log && break
  say "maskpath base ckpt + core voting (attempt $att)..."
  timeout 3600 python scripts/measure_maskpath_impact.py \
    --ckpt runs/seg2d_base_r4_full.ckpt --frames 6 --image_size 384 512 \
    --vcn_ckpt "$VCNM" > runs/maskpath_core_r5.log 2>&1
  say "maskpath core rc=$?"
  grep -q SUMMARY runs/maskpath_core_r5.log || wait_backend
done

# 2) hard ckpt, if runbook2 didn't land it
if [ -f runs/seg2d_hard_r5.ckpt ] && ! grep -q SUMMARY runs/maskpath_hard_r5.log 2>/dev/null; then
  for att in 1 2; do
    say "maskpath hard ckpt (attempt $att)..."
    timeout 3600 python scripts/measure_maskpath_impact.py \
      --ckpt runs/seg2d_hard_r5.ckpt --frames 6 --image_size 384 512 \
      --vcn_ckpt "$VCNM" > runs/maskpath_hard_r5.log 2>&1
    say "maskpath hard rc=$?"
    grep -q SUMMARY runs/maskpath_hard_r5.log && break
    wait_backend
  done
fi

# 3) clean bench with the fixed canary
for att in 1 2 3; do
  say "bench capture (attempt $att)..."
  timeout 3600 python bench.py > runs/bench_r5b.json 2> runs/bench_r5b.log
  rc=$?
  say "bench rc=$rc: $(tail -c 400 runs/bench_r5b.json)"
  [ "$rc" -eq 0 ] && break
  wait_backend
done
say "R5 RUNBOOK4 DONE"
