#!/bin/bash
# Round-4 TPU runbook: fire the full DA experiment + seg2d base run the
# moment the tunnel is back. Each stage logs under runs/ and is
# resumable (stages skip if their product exists).
set -u
cd /root/repo
LOG=runs/da_tpu_runbook.log
say() { echo "$(date +%H:%M:%S) $*" | tee -a "$LOG"; }

# 0. wait for the backend (probe in subprocesses; cached failures)
say "waiting for TPU backend..."
for i in $(seq 1 200); do
  if timeout 90 python -c "import jax; assert jax.devices()" 2>/dev/null; then
    say "backend up"; break
  fi
  sleep 120
done

VCN=runs/vcn_da/ckpt-best.pkl
[ -f "$VCN" ] || VCN=runs/vcn_da/ckpt-last.pkl
say "using VCN: $VCN"

# 1. SEE-complete the three sets (GT path; reference source recipe)
for s in src_train src_val tgt_val; do
  if [ ! -f runs/da/$s.completed.npz ]; then
    say "completing $s..."
    timeout 5400 python scripts/da_experiment.py complete \
      --set runs/da/$s.npz --vcn "$VCN" >> "$LOG" 2>&1
    say "complete $s rc=$?"
  fi
done

# 2. train the two detectors (raw / see)
if [ ! -f runs/da/det_raw/ckpt.pkl ]; then
  say "training det_raw..."
  timeout 7200 python scripts/da_experiment.py train \
    --train runs/da/src_train.npz --out runs/da/det_raw \
    --steps 3000 --batch 4 --bf16 > runs/da/det_raw.log 2>&1
  say "det_raw rc=$?"
fi
if [ ! -f runs/da/det_see/ckpt.pkl ]; then
  say "training det_see..."
  timeout 7200 python scripts/da_experiment.py train \
    --train runs/da/src_train.completed.npz --out runs/da/det_see \
    --steps 3000 --batch 4 --bf16 > runs/da/det_see.log 2>&1
  say "det_see rc=$?"
fi

# 3. the four evals (the DA table)
say "evaluating..."
timeout 3600 python scripts/da_experiment.py eval --ckpt runs/da/det_raw/ckpt.pkl \
  --set runs/da/tgt_val.npz --out_json runs/da/ap_raw_tgt.json \
  > runs/da/eval_raw_tgt.log 2>&1; say "raw/tgt rc=$?"
timeout 3600 python scripts/da_experiment.py eval --ckpt runs/da/det_see/ckpt.pkl \
  --set runs/da/tgt_val.completed.npz --out_json runs/da/ap_see_tgt.json \
  > runs/da/eval_see_tgt.log 2>&1; say "see/tgt rc=$?"
timeout 3600 python scripts/da_experiment.py eval --ckpt runs/da/det_raw/ckpt.pkl \
  --set runs/da/src_val.npz --out_json runs/da/ap_raw_src.json \
  > runs/da/eval_raw_src.log 2>&1; say "raw/src rc=$?"
timeout 3600 python scripts/da_experiment.py eval --ckpt runs/da/det_see/ckpt.pkl \
  --set runs/da/src_val.completed.npz --out_json runs/da/ap_see_src.json \
  > runs/da/eval_see_src.log 2>&1; say "see/src rc=$?"
# cross checks: raw detector on completed target (ablation)
timeout 3600 python scripts/da_experiment.py eval --ckpt runs/da/det_raw/ckpt.pkl \
  --set runs/da/tgt_val.completed.npz --out_json runs/da/ap_raw_tgtcomp.json \
  > runs/da/eval_raw_tgtcomp.log 2>&1; say "raw/tgtcomp rc=$?"

say "DA table:"
for j in runs/da/ap_*.json; do echo "$j: $(cat $j)" | tee -a "$LOG"; done

# 4. seg2d 384x512 base run (VERDICT r3 #4; died at step 0 in the outage)
if [ ! -f runs/seg2d_base_r4.ckpt ]; then
  say "seg2d base 384x512 run..."
  timeout 28800 python -m seevcn_tpu.cli.train_seg2d \
    --out runs/seg2d_base_r4.ckpt --steps 2500 --batch_size 8 \
    --image_size 384 512 --size base --eval_every 500 \
    > runs/seg2d_base_r4.log 2>&1
  say "seg2d base rc=$?"
fi

say "RUNBOOK DONE"
