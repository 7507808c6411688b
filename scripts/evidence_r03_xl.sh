#!/usr/bin/env bash
# Round-3 XL-scale evidence drive (VERDICT r2 task 7): the 18.5M-param
# flagship_xl config through a real stage-1 + stage-2 GAN drive on the
# TPU, plus a remat on/off probe (steps/s + HBM peak delta).
#
# Runs on the REAL chip — never run anything else against it meanwhile.
# Wall-clock ~30-45 min over the tunnel. Assumes data/synthetic-1000
# exists (scripts/evidence_r03.sh creates it).
set -euo pipefail
cd "$(dirname "$0")/.."
ROOT=${1:-outputs/evidence_r03_xl}
EV=artifacts/evidence_r03/xl
mkdir -p "$ROOT" "$EV"

# 1. Stage-1 acoustic at XL: 1500 steps, HBM-resident data, jsonl metrics
#    (steps_per_sec + hbm_peak_gb land in the log lines).
python scripts/train.py --config configs/flagship_xl.yaml \
  data.data_dir=data/synthetic-1000 \
  training.max_steps=1500 \
  training.validate_every=500 training.save_every=500 \
  training.log_every=100 \
  paths.output_dir="$ROOT/stage1" \
  paths.checkpoint_dir="$ROOT/stage1/ckpt" \
  paths.log_dir="$ROOT/stage1/logs" \
  system.log_metrics=jsonl

# 2. Remat-off probe: same config, 200 steps, model.remat=false — the
#    committed delta is steps/s (remat pays recompute) vs HBM peak
#    (remat saves activation memory).
python scripts/train.py --config configs/flagship_xl.yaml \
  data.data_dir=data/synthetic-1000 \
  model.remat=false \
  training.max_steps=200 \
  training.validate_every=1000 training.save_every=1000 \
  training.log_every=50 \
  paths.output_dir="$ROOT/stage1_noremat" \
  paths.checkpoint_dir="$ROOT/stage1_noremat/ckpt" \
  paths.log_dir="$ROOT/stage1_noremat/logs" \
  system.log_metrics=jsonl

# 3. Stage-2 GAN at XL: warm start from stage-1, 600 steps — the first
#    committed GAN step-rate measurement at 18.5M params.
python scripts/train_stage2.py --config configs/flagship_xl.yaml \
  data.data_dir=data/synthetic-1000 \
  training.max_steps=600 \
  training.validate_every=200 training.save_every=200 \
  training.log_every=50 \
  training.init_generator_from="$ROOT/stage1/ckpt" \
  paths.output_dir="$ROOT/stage2" \
  paths.checkpoint_dir="$ROOT/stage2/ckpt" \
  paths.log_dir="$ROOT/stage2/logs" \
  system.log_metrics=jsonl

# 4. Eval the best stage-2 checkpoint with the intrusive audio metrics.
python scripts/evaluate.py --checkpoint "$ROOT/stage2/ckpt" --step best \
  --data-dir data/synthetic-1000 --num-samples 32 --audio-metrics \
  --json > "$EV/eval_best.json"

# 5. Collect the series.
cp "$ROOT/stage1/logs"/*.jsonl "$EV/stage1_metrics.jsonl"
cp "$ROOT/stage1_noremat/logs"/*.jsonl "$EV/stage1_noremat_metrics.jsonl"
cp "$ROOT/stage2/logs"/*.jsonl "$EV/stage2_metrics.jsonl"

echo "XL evidence collected under $EV"
