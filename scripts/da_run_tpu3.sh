#!/bin/bash
# Round-4 TPU runbook v3: the LARGER-SCALE DA experiment (round-5 agenda
# item 3 in STATUS.md) + the full 2500-step seg2d base run.
#
# da2 = 2048 source frames (4x da), 128/256 val frames, same 64->16-beam
# shift; detectors train 8000 steps (2.7x da) with crash-resume
# (da_experiment.py --resume saves opt_state+step every ckpt_every).
# Stages skip when their product exists; every stage retries after a
# backend re-probe (the 04:42 tunnel wedge pattern).
set -u
cd /root/repo
LOG=runs/da_tpu_runbook3.log
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

say "waiting for TPU backend..."
wait_backend && say "backend up" || { say "backend never returned"; exit 1; }

VCN=runs/vcn_da/ckpt-best.pkl
STEPS=8000

# 1) SEE-complete the da2 sets (device pipeline, ~0.11 s/frame steady)
for s in src_train src_val tgt_val; do
  for att in 1 2 3; do
    [ -f "runs/da2/$s.completed.npz" ] && break
    say "completing da2/$s (attempt $att)..."
    timeout 7200 python scripts/da_experiment.py complete \
      --set "runs/da2/$s.npz" --vcn "$VCN" \
      > "runs/da2/complete_$s.log" 2>&1
    say "complete $s rc=$?"
    [ -f "runs/da2/$s.completed.npz" ] || wait_backend
  done
done

# 2) detectors (8000 steps, batch 4, bf16; --resume restarts from the
#    last 500-step ckpt after a crash)
train_det() {  # name trainset
  local name=$1 trainset=$2
  for att in 1 2 3 4; do
    if [ -f "runs/da2/$name/ckpt.pkl" ] && \
       python - "$name" "$STEPS" <<'EOF'
import pickle, sys
ck = pickle.load(open(f"runs/da2/{sys.argv[1]}/ckpt.pkl", "rb"))
sys.exit(0 if ck.get("step", 0) >= int(sys.argv[2]) else 1)
EOF
    then break; fi
    say "training $name (attempt $att)..."
    timeout 14400 python scripts/da_experiment.py train \
      --train "$trainset" --out "runs/da2/$name" \
      --steps $STEPS --batch 4 --bf16 --remat none --resume \
      >> "runs/da2/$name.log" 2>&1
    say "$name rc=$?"
    wait_backend
  done
}
train_det det_raw runs/da2/src_train.npz
train_det det_see runs/da2/src_train.completed.npz

# 3) the five evals
run_eval() {  # name ckpt set json
  local name=$1 ckpt=$2 set=$3 json=$4
  for att in 1 2; do
    [ -f "$json" ] && return
    say "eval $name (attempt $att)..."
    timeout 3600 python scripts/da_experiment.py eval --ckpt "$ckpt" \
      --set "$set" --out_json "$json" > "runs/da2/eval_$name.log" 2>&1
    say "eval $name rc=$?"
    [ -f "$json" ] || wait_backend
  done
}
run_eval raw_tgt runs/da2/det_raw/ckpt.pkl runs/da2/tgt_val.npz runs/da2/ap_raw_tgt.json
run_eval see_tgt runs/da2/det_see/ckpt.pkl runs/da2/tgt_val.completed.npz runs/da2/ap_see_tgt.json
run_eval raw_src runs/da2/det_raw/ckpt.pkl runs/da2/src_val.npz runs/da2/ap_raw_src.json
run_eval see_src runs/da2/det_see/ckpt.pkl runs/da2/src_val.completed.npz runs/da2/ap_see_src.json
run_eval raw_tgtcomp runs/da2/det_raw/ckpt.pkl runs/da2/tgt_val.completed.npz runs/da2/ap_raw_tgtcomp.json

say "DA2 table:"
for j in runs/da2/ap_*.json; do [ -f "$j" ] && echo "$j: $(cat $j)" | tee -a "$LOG"; done

# 4) the full 2500-step seg2d base run (the r3 #4 closeout; eval-point
#    checkpointing keeps partials useful)
if [ ! -f runs/seg2d_base_r4_full.done ]; then
  say "seg2d base 384x512 full 2500-step run..."
  timeout 21600 python -m seevcn_tpu.cli.train_seg2d \
    --out runs/seg2d_base_r4_full.ckpt --steps 2500 --batch_size 8 \
    --image_size 384 512 --size base --eval_every 500 \
    > runs/seg2d_base_r4_full.log 2>&1 && touch runs/seg2d_base_r4_full.done
  say "seg2d base rc=$?"
fi

say "RUNBOOK3 DONE"
