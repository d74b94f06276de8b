#!/bin/bash
# Round-5 runbook part 3: DA at da3 scale — 4,096 source frames (the
# reference's full-dataset protocol scale: nuScenes top-100 = 4,025
# frames, docs/DATASET_PREPARATION.md:21-22) x 10,000 steps (VERDICT r4
# asked for "2,048+ frames, >=10k steps"; da2 ran 8k). Protocol is the
# round-5 v2 (reference-matching) recipe throughout: source completed
# with VCN_CN canonicalized by GT boxes (VCN_CN.py:111-156), target with
# the r5 VCN_VC; val sets are IDENTICAL to da2's so AP deltas are
# attributable to training scale alone. Waits for r5_runbook2 (pid in
# /tmp/r5_runbook2.pid) to release the chip.
set -u
cd /root/repo
LOG=runs/r5_runbook3.log
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

RB_PID=$(cat /tmp/r5_runbook2.pid 2>/dev/null || echo 0)
say "waiting for r5_runbook2 (pid $RB_PID)..."
for i in $(seq 1 700); do
  kill -0 "$RB_PID" 2>/dev/null || break
  sleep 60
done
say "r5_runbook2 done; starting da3"

# generation must have finished (CPU job started alongside)
for i in $(seq 1 120); do
  grep -q "ALL DONE" runs/da3_generate.log 2>/dev/null && break
  sleep 60
done
grep -q "ALL DONE" runs/da3_generate.log || { say "da3 generation never finished"; exit 1; }
wait_backend || { say "backend never returned"; exit 1; }

STEPS=10000
VCN_CN2=runs/vcn_cn_r5/ckpt-best.pkl

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

# 1) complete the 4,096-frame source with VCN_CN (reference source model)
for att in 1 2 3; do
  [ -f runs/da3/src_train.cn.npz ] && break
  say "completing runs/da3/src_train.cn.npz with VCN_CN (attempt $att)..."
  timeout 7200 python scripts/da_experiment.py complete \
    --set runs/da3/src_train.npz --out runs/da3/src_train.cn.npz \
    --model VCN_CN --vcn "$VCN_CN2" \
    > runs/da3/complete_src_train.log 2>&1
  say "complete rc=$?"
  [ -f runs/da3/src_train.cn.npz ] || wait_backend
done

# 2) both detectors at 10k steps
train_det det_raw3 runs/da3/src_train.npz
train_det det_see3 runs/da3/src_train.cn.npz

# 3) evals, headline (protocol-match target) first so partial results
#    still tell the story; val sets shared with da2
if [ -f runs/da3/det_see3/ckpt.pkl ]; then
  run_eval see3_tgt runs/da3/det_see3/ckpt.pkl runs/da2/tgt_val.vc2.npz runs/da3/ap_see3_tgt.json
fi
if [ -f runs/da3/det_raw3/ckpt.pkl ]; then
  run_eval raw3_tgt runs/da3/det_raw3/ckpt.pkl runs/da2/tgt_val.npz runs/da3/ap_raw3_tgt.json
fi
if [ -f runs/da3/det_see3/ckpt.pkl ]; then
  run_eval see3_src runs/da3/det_see3/ckpt.pkl runs/da2/src_val.cn.npz runs/da3/ap_see3_src.json
fi
if [ -f runs/da3/det_raw3/ckpt.pkl ]; then
  run_eval raw3_src runs/da3/det_raw3/ckpt.pkl runs/da2/src_val.npz runs/da3/ap_raw3_src.json
  run_eval raw3_tgtcomp runs/da3/det_raw3/ckpt.pkl runs/da2/tgt_val.vc2.npz runs/da3/ap_raw3_tgtcomp.json
fi
# 4) in-domain attribution matrix, da2 detectors (cheap, completes the
#    2x2: train {raw,cn} x eval {raw,cn} — isolates whether the in-domain
#    AP loss comes from completion distribution vs VCN placement noise)
if [ -f runs/da2/det_raw/ckpt.pkl ]; then
  run_eval raw_srccomp runs/da2/det_raw/ckpt.pkl runs/da2/src_val.cn.npz runs/da2/ap_raw_srccomp.json
fi
if [ -f runs/da2/det_see2/ckpt.pkl ]; then
  run_eval see2_srcraw runs/da2/det_see2/ckpt.pkl runs/da2/src_val.npz runs/da2/ap_see2_srcraw.json
fi

say "DA3 table:"
for j in runs/da3/ap_*.json; do [ -f "$j" ] && echo "$j: $(cat $j)" | tee -a "$LOG"; done
say "R5 RUNBOOK3 DONE"
