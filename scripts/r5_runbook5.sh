#!/bin/bash
# Round-5 session-2 runbook. The machine restarted between sessions and
# runs/ artifacts (datasets, checkpoints) are gone — regenerate what is
# needed and land the two items the round still owes:
#   A) VCN_VC + VCN_CN r5 retrains (same recipes as the committed
#      runs/vcn_*_r5 logs; fresh logs land as *_train2.log)
#   B) clean bench capture with the chip canary (quiet machine)
#   C) da3: the reference-protocol-scale DA run — 4,096 source frames
#      (nuScenes top-100 = 4,025, docs/DATASET_PREPARATION.md:21-22)
#      x 10,000 steps (VERDICT r4 asked "2,048+ frames, >=10k steps"),
#      v2 protocol (source completed by VCN_CN with GT boxes, target by
#      VCN_VC), with the full 2x2 in-domain attribution matrix folded
#      into the eval grid: train {raw,cn} x eval-src-val {raw,cn}.
# Train stages branch on da_experiment tunnel exit codes: rc=2 permanent
# (abort), others retry with --resume.
set -u
cd /root/repo
LOG=runs/r5_runbook5.log
say() { echo "$(date +%H:%M:%S) $*" | tee -a "$LOG"; }

wait_backend() {
  for i in $(seq 1 200); do
    if timeout 180 python -c "import jax; assert jax.devices()" 2>/dev/null; then
      return 0
    fi
    sleep 60
  done
  return 1
}

wait_marker() {  # marker file
  for i in $(seq 1 400); do
    grep -q "$1" "$2" 2>/dev/null && return 0
    sleep 30
  done
  return 1
}

train_det() {  # name trainset
  local name=$1 trainset=$2
  for att in 1 2 3 4; do
    if [ -f "runs/da3/$name/ckpt.pkl" ] && \
       python - "$name" "$STEPS" <<'EOF'
import pickle, sys
ck = pickle.load(open(f"runs/da3/{sys.argv[1]}/ckpt.pkl", "rb"))
sys.exit(0 if ck.get("step", 0) >= int(sys.argv[2]) else 1)
EOF
    then say "$name already complete"; return 0; fi
    say "training $name (attempt $att)..."
    timeout 7200 python scripts/da_experiment.py train \
      --train "$trainset" --out "runs/da3/$name" \
      --steps $STEPS --batch 4 --bf16 --remat none --resume \
      >> "runs/da3/$name.log" 2>&1
    rc=$?
    say "$name rc=$rc"
    if [ "$rc" -eq 2 ]; then
      say "$name: PERMANENT tunnel failure (payload too large) — aborting"
      return 2
    fi
    [ "$rc" -eq 0 ] && return 0
    wait_backend
  done
  return 1
}

run_eval() {  # name ckpt set json
  local name=$1 ckpt=$2 set=$3 json=$4
  for att in 1 2 3; do
    [ -f "$json" ] && return 0
    say "eval $name (attempt $att)..."
    timeout 3600 python scripts/da_experiment.py eval --ckpt "$ckpt" \
      --set "$set" --out_json "$json" > "runs/da3/eval_$name.log" 2>&1
    say "eval $name rc=$?"
    [ -f "$json" ] || wait_backend
  done
}

complete_set() {  # in out model vcn
  local in=$1 out=$2 model=$3 vcn=$4
  for att in 1 2 3; do
    [ -f "$out" ] && return 0
    say "completing $out with $model (attempt $att)..."
    timeout 7200 python scripts/da_experiment.py complete \
      --set "$in" --out "$out" --model "$model" --vcn "$vcn" \
      > "runs/da3/complete_$(basename $out .npz).log" 2>&1
    say "complete $out rc=$?"
    [ -f "$out" ] || wait_backend
  done
}

mkdir -p runs/da3
wait_backend || { say "backend never came up"; exit 1; }

# ---- A) VCN retrains (need vc_data from the generator) --------------------
say "waiting for vc_data..."
wait_marker "wrote runs/da/vc_data" runs/da3_generate.log || { say "vc_data never landed"; exit 1; }
if [ ! -f runs/vcn_r5/ckpt-best.pkl ]; then
  say "training VCN_VC r5 (folded rotation + OneCycle, 100 epochs)..."
  timeout 7200 python scripts/train_vcn_da.py --epochs 100 \
    --out runs/vcn_r5 > runs/vcn_r5_train2.log 2>&1
  say "vcn_vc r5 rc=$?"
  wait_backend
fi
if [ ! -f runs/vcn_cn_r5/ckpt-best.pkl ]; then
  say "training VCN_CN r5 (GT-canonical source model, 100 epochs)..."
  timeout 7200 python scripts/train_vcn_da.py --epochs 100 --model VCN_CN \
    --out runs/vcn_cn_r5 > runs/vcn_cn_r5_train2.log 2>&1
  say "vcn_cn r5 rc=$?"
  wait_backend
fi
VCN_VC2=runs/vcn_r5/ckpt-best.pkl
VCN_CN2=runs/vcn_cn_r5/ckpt-best.pkl

# ---- B) clean bench once the generator is done (quiet machine) ------------
say "waiting for da3 generation ALL DONE..."
wait_marker "ALL DONE" runs/da3_generate.log || { say "generation never finished"; exit 1; }
for att in 1 2 3; do
  say "bench capture (attempt $att)..."
  timeout 3600 python bench.py > runs/bench_r5b.json 2> runs/bench_r5b.log
  rc=$?
  say "bench rc=$rc: $(tail -c 400 runs/bench_r5b.json)"
  [ "$rc" -eq 0 ] && break
  wait_backend
done

# ---- C) da3 ---------------------------------------------------------------
STEPS=10000
# completions: val sets first (cheap, unblock evals), then the big one
complete_set runs/da3/src_val.npz runs/da3/src_val.cn.npz  VCN_CN "$VCN_CN2"
complete_set runs/da3/tgt_val.npz runs/da3/tgt_val.vc2.npz VCN_VC "$VCN_VC2"
complete_set runs/da3/src_train.npz runs/da3/src_train.cn.npz VCN_CN "$VCN_CN2"

train_det det_raw3 runs/da3/src_train.npz
train_det det_see3 runs/da3/src_train.cn.npz

# evals in priority order (headline first so partial results still tell
# the story); last four rows form the 2x2 in-domain attribution matrix
if [ -f runs/da3/det_see3/ckpt.pkl ]; then
  run_eval see3_tgt runs/da3/det_see3/ckpt.pkl runs/da3/tgt_val.vc2.npz runs/da3/ap_see3_tgt.json
fi
if [ -f runs/da3/det_raw3/ckpt.pkl ]; then
  run_eval raw3_tgt runs/da3/det_raw3/ckpt.pkl runs/da3/tgt_val.npz runs/da3/ap_raw3_tgt.json
  run_eval raw3_tgtcomp runs/da3/det_raw3/ckpt.pkl runs/da3/tgt_val.vc2.npz runs/da3/ap_raw3_tgtcomp.json
  run_eval raw3_src runs/da3/det_raw3/ckpt.pkl runs/da3/src_val.npz runs/da3/ap_raw3_src.json
fi
if [ -f runs/da3/det_see3/ckpt.pkl ]; then
  run_eval see3_src runs/da3/det_see3/ckpt.pkl runs/da3/src_val.cn.npz runs/da3/ap_see3_src.json
  run_eval see3_srcraw runs/da3/det_see3/ckpt.pkl runs/da3/src_val.npz runs/da3/ap_see3_srcraw.json
fi
if [ -f runs/da3/det_raw3/ckpt.pkl ]; then
  run_eval raw3_srccomp runs/da3/det_raw3/ckpt.pkl runs/da3/src_val.cn.npz runs/da3/ap_raw3_srccomp.json
fi

say "DA3 table:"
for j in runs/da3/ap_*.json; do [ -f "$j" ] && echo "$j: $(cat $j)" | tee -a "$LOG"; done
say "R5 RUNBOOK5 DONE"
