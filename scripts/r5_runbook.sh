#!/bin/bash
# Round-5 TPU runbook (VERDICT r4 next-round items 1-4):
#   A) finish da2: train det_raw with the fixed (non-closure) train step,
#      run the 3 raw evals that failed on the missing ckpt
#   B) retrain VCN_VC with the symmetry-folded rotation loss + OneCycleLR;
#      train VCN_CN (GT-canonical source completion, the reference's
#      source-domain model)
#   C) reference-protocol v2 completion at da2 scale: source completed
#      with VCN_CN (no regressed-pose placement noise — the in-domain
#      ablation VERDICT asked for), target completed with the new VCN_VC;
#      train det_see2 on the CN-completed source; 4 evals
#   D) maskpath re-measure with the full seg2d ckpt + sanity guard
#   E) bench.py capture with the chip canary
# Train stages branch on da_experiment's tunnel exit codes: rc=2 is a
# permanent payload failure (abort, never retry); rc=3/124 are
# transient/timeout (retry with --resume).
set -u
cd /root/repo
LOG=runs/r5_runbook.log
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

# 0) wait for runbook3 (seg2d 2500-step run) to release the chip
say "waiting for runbook3 (pid ${RB3_PID:-31735}) to finish..."
for i in $(seq 1 400); do
  kill -0 "${RB3_PID:-31735}" 2>/dev/null || break
  sleep 60
done
say "runbook3 done; starting r5 stages"
wait_backend || { say "backend never returned"; exit 1; }

STEPS=8000

train_det() {  # name trainset
  local name=$1 trainset=$2
  for att in 1 2 3 4; do
    if [ -f "runs/da2/$name/ckpt.pkl" ] && \
       python - "$name" "$STEPS" <<'EOF'
import pickle, sys
ck = pickle.load(open(f"runs/da2/{sys.argv[1]}/ckpt.pkl", "rb"))
sys.exit(0 if ck.get("step", 0) >= int(sys.argv[2]) else 1)
EOF
    then say "$name already complete"; return 0; fi
    say "training $name (attempt $att)..."
    timeout 7200 python scripts/da_experiment.py train \
      --train "$trainset" --out "runs/da2/$name" \
      --steps $STEPS --batch 4 --bf16 --remat none --resume \
      >> "runs/da2/$name.log" 2>&1
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
      --set "$set" --out_json "$json" > "runs/da2/eval_$name.log" 2>&1
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
      > "runs/da2/complete_$(basename $out .npz).log" 2>&1
    say "complete $out rc=$?"
    [ -f "$out" ] || wait_backend
  done
}

# ---- A) det_raw + the 3 missing raw evals --------------------------------
train_det det_raw runs/da2/src_train.npz
rc=$?
if [ "$rc" -eq 0 ]; then
  run_eval raw_tgt runs/da2/det_raw/ckpt.pkl runs/da2/tgt_val.npz runs/da2/ap_raw_tgt.json
  run_eval raw_src runs/da2/det_raw/ckpt.pkl runs/da2/src_val.npz runs/da2/ap_raw_src.json
  run_eval raw_tgtcomp runs/da2/det_raw/ckpt.pkl runs/da2/tgt_val.completed.npz runs/da2/ap_raw_tgtcomp.json
fi
say "DA2 table v1 (r4 VCN completions):"
for j in runs/da2/ap_*.json; do [ -f "$j" ] && echo "$j: $(cat $j)" | tee -a "$LOG"; done

# ---- B) VCN retrains -------------------------------------------------------
if [ ! -f runs/vcn_r5/ckpt-best.pkl ]; then
  say "training VCN_VC r5 (folded rotation + OneCycle, 100 epochs)..."
  timeout 7200 python scripts/train_vcn_da.py --epochs 100 \
    --out runs/vcn_r5 > runs/vcn_r5_train.log 2>&1
  say "vcn_vc r5 rc=$?"
  wait_backend
fi
if [ ! -f runs/vcn_cn_r5/ckpt-best.pkl ]; then
  say "training VCN_CN r5 (GT-canonical source model, 100 epochs)..."
  timeout 7200 python scripts/train_vcn_da.py --epochs 100 --model VCN_CN \
    --out runs/vcn_cn_r5 > runs/vcn_cn_r5_train.log 2>&1
  say "vcn_cn r5 rc=$?"
  wait_backend
fi

# ---- C) reference-protocol v2 completions + det_see2 + evals --------------
VCN_VC2=runs/vcn_r5/ckpt-best.pkl
VCN_CN2=runs/vcn_cn_r5/ckpt-best.pkl
if [ -f "$VCN_CN2" ]; then
  complete_set runs/da2/src_train.npz runs/da2/src_train.cn.npz VCN_CN "$VCN_CN2"
  complete_set runs/da2/src_val.npz   runs/da2/src_val.cn.npz   VCN_CN "$VCN_CN2"
fi
if [ -f "$VCN_VC2" ]; then
  complete_set runs/da2/tgt_val.npz   runs/da2/tgt_val.vc2.npz  VCN_VC "$VCN_VC2"
fi

if [ -f runs/da2/src_train.cn.npz ]; then
  train_det det_see2 runs/da2/src_train.cn.npz
  if [ $? -eq 0 ]; then
    run_eval see2_src runs/da2/det_see2/ckpt.pkl runs/da2/src_val.cn.npz runs/da2/ap_see2_src.json
    run_eval see2_tgt runs/da2/det_see2/ckpt.pkl runs/da2/tgt_val.vc2.npz runs/da2/ap_see2_tgt.json
  fi
fi
if [ -f runs/da2/tgt_val.vc2.npz ] && [ -f runs/da2/det_raw/ckpt.pkl ]; then
  # rotation-fix ablation: raw detector on tgt completed with NEW VCN_VC
  # (compare against ap_raw_tgtcomp which used the r4 VCN_VC)
  run_eval raw_tgtcomp2 runs/da2/det_raw/ckpt.pkl runs/da2/tgt_val.vc2.npz runs/da2/ap_raw_tgtcomp2.json
fi
say "DA2 table v2 (r5 VCN protocol):"
for j in runs/da2/ap_*.json; do [ -f "$j" ] && echo "$j: $(cat $j)" | tee -a "$LOG"; done

# ---- D) maskpath re-measure ------------------------------------------------
SEG=runs/seg2d_base_r4_full.ckpt
[ -f "$SEG" ] || SEG=runs/seg2d_base_r4.ckpt
VCNM=$VCN_VC2; [ -f "$VCNM" ] || VCNM=runs/vcn_da/ckpt-best.pkl
for att in 1 2; do
  [ -f runs/maskpath_r5.log ] && grep -q SUMMARY runs/maskpath_r5.log && break
  say "maskpath re-measure (seg=$SEG vcn=$VCNM, attempt $att)..."
  timeout 3600 python scripts/measure_maskpath_impact.py --ckpt "$SEG" \
    --frames 6 --image_size 384 512 --vcn_ckpt "$VCNM" \
    > runs/maskpath_r5.log 2>&1
  say "maskpath rc=$?"
  grep -q SUMMARY runs/maskpath_r5.log || wait_backend
done

# ---- E) bench capture with canary ------------------------------------------
for att in 1 2; do
  [ -f runs/bench_r5.json ] && grep -q metric runs/bench_r5.json && break
  say "bench capture (attempt $att)..."
  timeout 3600 python bench.py > runs/bench_r5.json 2> runs/bench_r5.log
  say "bench rc=$?"
  grep -q metric runs/bench_r5.json || wait_backend
done
say "R5 RUNBOOK DONE"
