#!/usr/bin/env bash
# Round-3 training-evidence drive (VERDICT r2 tasks 1 + 7).
# Runs on the REAL TPU chip — never run anything else against the chip
# while this is going. Total wall-clock ~45-75 min over the tunnel.
#
# Usage: bash scripts/evidence_r03.sh [output_root]
set -euo pipefail
cd "$(dirname "$0")/.."
ROOT=${1:-outputs/evidence_r03}
EV=artifacts/evidence_r03
mkdir -p "$ROOT" "$EV/wavs"

# 1. Learnable synthetic corpus: 1000 utterances, phoneme-keyed audio,
#    varied F0 (0.7-1.4x) and speaking rate (0.8-1.3x).
if [ ! -d data/synthetic-1000 ]; then
  python scripts/download_data.py --synthetic 1000 --data-dir data
fi

# 2. Stage-1 acoustic training: flagship config, 6000 steps, HBM-resident
#    data, validation every 500 (sample WAVs + val losses).
python scripts/train.py --config configs/flagship_tpu.yaml \
  data.data_dir=data/synthetic-1000 \
  training.max_steps=3000 training.device_data_cache=true \
  training.validate_every=500 training.save_every=1000 \
  training.log_every=100 \
  paths.output_dir="$ROOT/stage1" \
  paths.checkpoint_dir="$ROOT/stage1/ckpt" \
  paths.log_dir="$ROOT/stage1/logs" \
  system.log_metrics=jsonl

# 2b. resume leg: proves the checkpoint/resume boundary at 3000.
python scripts/train.py --config configs/flagship_tpu.yaml --resume \
  data.data_dir=data/synthetic-1000 \
  training.max_steps=6000 training.device_data_cache=true \
  training.validate_every=500 training.save_every=1000 \
  training.log_every=100 \
  paths.output_dir="$ROOT/stage1" \
  paths.checkpoint_dir="$ROOT/stage1/ckpt" \
  paths.log_dir="$ROOT/stage1/logs" \
  system.log_metrics=jsonl

# 3. Stage-2 GAN: warm start from stage-1, 2500 steps, the new
#    quality_score gate (teacher-forced MCD + spectral convergence) must
#    move across validations.
python scripts/train_stage2.py --config configs/flagship_tpu.yaml \
  data.data_dir=data/synthetic-1000 \
  training.max_steps=2500 training.device_data_cache=true \
  training.validate_every=250 training.save_every=500 \
  training.log_every=50 \
  training.init_generator_from="$ROOT/stage1/ckpt" \
  paths.output_dir="$ROOT/stage2" \
  paths.checkpoint_dir="$ROOT/stage2/ckpt" \
  paths.log_dir="$ROOT/stage2/logs" \
  system.log_metrics=jsonl

# 4. Post-training evaluation at an EARLY vs the BEST checkpoint: the
#    across-checkpoint improvement VERDICT asked for, with the intrusive
#    audio metrics (STOI etc.).
python scripts/evaluate.py --checkpoint "$ROOT/stage2/ckpt" --step best \
  --data-dir data/synthetic-1000 --num-samples 64 --audio-metrics \
  -t "the quick brown fox jumps over a lazy dog" \
  --dump-wavs "$EV/wavs" --json > "$EV/eval_best.json"
python scripts/evaluate.py --checkpoint "$ROOT/stage2/ckpt" --step 500 \
  --data-dir data/synthetic-1000 --num-samples 64 --audio-metrics \
  --json > "$EV/eval_step500.json" || true

# 5. Collect the metric series.
cp "$ROOT/stage1/logs"/*.jsonl "$EV/stage1_metrics.jsonl"
cp "$ROOT/stage2/logs"/*.jsonl "$EV/stage2_metrics.jsonl"
cp "$ROOT"/stage1/samples/sample_step_500_text_0.wav "$EV/wavs/" 2>/dev/null || true
cp "$ROOT"/stage1/samples/sample_step_6000_text_0.wav "$EV/wavs/" 2>/dev/null || true
cp "$ROOT"/stage2/samples/sample_step_2500_text_0.wav "$EV/wavs/" 2>/dev/null || true

echo "evidence collected under $EV"
