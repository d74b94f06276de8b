#!/bin/bash
# Round-5 runbook part 2 (VERDICT r4 #7): hard-regime seg2d training
# (far instances + occlusion, FULL HTC: cascade + semantic branch
# + mask info flow) with distance-bucket AP, then a maskpath
# re-measure with whichever checkpoint detects better. Waits for
# r5_runbook.sh (pid in /tmp/r5_runbook.pid) to release the chip.
set -u
cd /root/repo
LOG=runs/r5_runbook2.log
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

RB_PID=$(cat /tmp/r5_runbook.pid 2>/dev/null || echo 0)
say "waiting for r5_runbook (pid $RB_PID)..."
for i in $(seq 1 700); do
  kill -0 "$RB_PID" 2>/dev/null || break
  sleep 60
done
say "r5_runbook done; starting part 2"
wait_backend || { say "backend never returned"; exit 1; }

# hard-regime base run at 384x512: far bucket AP target >= 0.6
if [ ! -f runs/seg2d_hard_r5.done ]; then
  for att in 1 2; do
    say "seg2d hard 384x512 base 2500-step run (attempt $att)..."
    timeout 14400 python -m seevcn_tpu.cli.train_seg2d \
      --out runs/seg2d_hard_r5.ckpt --steps 2500 --batch_size 8 \
      --image_size 384 512 --size base --eval_every 500 --hard \
      --cascade 3 --semantic --mask_info_flow \
      --eval_scenes 48 > runs/seg2d_hard_r5.log 2>&1 \
      && touch runs/seg2d_hard_r5.done && break
    say "seg2d hard rc=$?"
    wait_backend
  done
fi

# bucket eval of the EASY-trained full ckpt on hard scenes, for contrast
if [ -f runs/seg2d_base_r4_full.ckpt ] && [ ! -f runs/seg2d_base_on_hard.json ]; then
  say "bucket-eval base ckpt on hard scenes..."
  timeout 3600 python - > runs/seg2d_base_on_hard.json 2> runs/seg2d_base_on_hard.log <<'EOF'
import json, pickle, sys
sys.path.insert(0, "/root/repo")
from seevcn_tpu.cli.train_seg2d import evaluate
from seevcn_tpu.models.seg2d.backend import build_seg2d
with open("runs/seg2d_base_r4_full.ckpt", "rb") as f:
    d = pickle.load(f)
model, _ = build_seg2d(d["cfg"])
ev = evaluate(model, {"params": d["params"],
                      "batch_stats": d["batch_stats"]},
              d["cfg"], 48, 0, hard=True)
print(json.dumps(ev))
EOF
  say "base-on-hard rc=$?: $(cat runs/seg2d_base_on_hard.json)"
fi

# maskpath with the hard ckpt (the harness has small/far cars too)
VCNM=runs/vcn_r5/ckpt-best.pkl
[ -f "$VCNM" ] || VCNM=runs/vcn_da/ckpt-best.pkl
if [ -f runs/seg2d_hard_r5.ckpt ]; then
  for att in 1 2; do
    [ -f runs/maskpath_hard_r5.log ] && grep -q SUMMARY runs/maskpath_hard_r5.log && break
    say "maskpath with hard ckpt (attempt $att)..."
    timeout 3600 python scripts/measure_maskpath_impact.py \
      --ckpt runs/seg2d_hard_r5.ckpt --frames 6 --image_size 384 512 \
      --vcn_ckpt "$VCNM" > runs/maskpath_hard_r5.log 2>&1
    say "maskpath hard rc=$?"
    grep -q SUMMARY runs/maskpath_hard_r5.log || wait_backend
  done
fi
say "R5 RUNBOOK2 DONE"
