#!/bin/bash
# Round-4 TPU runbook v2: resume the DA experiment after the 04:42 tunnel
# wedge. Differences from v1: per-stage crash RETRIES (det_see died once to
# a remote-compile connection flake), a backend probe before every stage,
# and the seg2d base run last. Stages skip when their product exists.
set -u
cd /root/repo
LOG=runs/da_tpu_runbook2.log
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

# det_see training (crashed at compile in v1) — 3 attempts
for att in 1 2 3; do
  [ -f runs/da/det_see/ckpt.pkl ] && break
  say "training det_see (attempt $att)..."
  timeout 7200 python scripts/da_experiment.py train \
    --train runs/da/src_train.completed.npz --out runs/da/det_see \
    --steps 3000 --batch 4 --bf16 > runs/da/det_see.log 2>&1
  say "det_see rc=$?"
  [ -f runs/da/det_see/ckpt.pkl ] || { say "det_see missing, re-probing"; wait_backend; }
done

# the five evals, each retried once after a backend re-probe
run_eval() {  # name ckpt set json
  local name=$1 ckpt=$2 set=$3 json=$4
  for att in 1 2; do
    [ -f "$json" ] && return
    say "eval $name (attempt $att)..."
    timeout 3600 python scripts/da_experiment.py eval --ckpt "$ckpt" \
      --set "$set" --out_json "$json" > "runs/da/eval_$name.log" 2>&1
    say "eval $name rc=$?"
    [ -f "$json" ] || wait_backend
  done
}
run_eval raw_tgt runs/da/det_raw/ckpt.pkl runs/da/tgt_val.npz runs/da/ap_raw_tgt.json
run_eval see_tgt runs/da/det_see/ckpt.pkl runs/da/tgt_val.completed.npz runs/da/ap_see_tgt.json
run_eval raw_src runs/da/det_raw/ckpt.pkl runs/da/src_val.npz runs/da/ap_raw_src.json
run_eval see_src runs/da/det_see/ckpt.pkl runs/da/src_val.completed.npz runs/da/ap_see_src.json
run_eval raw_tgtcomp runs/da/det_raw/ckpt.pkl runs/da/tgt_val.completed.npz runs/da/ap_raw_tgtcomp.json

say "DA table:"
for j in runs/da/ap_*.json; do [ -f "$j" ] && echo "$j: $(cat $j)" | tee -a "$LOG"; done

# seg2d 384x512 base run (VERDICT r3 #4)
if [ ! -f runs/seg2d_base_r4.ckpt ]; then
  say "seg2d base 384x512 run..."
  timeout 21600 python -m seevcn_tpu.cli.train_seg2d \
    --out runs/seg2d_base_r4.ckpt --steps 2500 --batch_size 8 \
    --image_size 384 512 --size base --eval_every 500 \
    > runs/seg2d_base_r4.log 2>&1
  say "seg2d base rc=$?"
fi

say "RUNBOOK2 DONE"
