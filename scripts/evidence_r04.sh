#!/usr/bin/env bash
# Round-4 training-evidence drive (VERDICT r3 tasks 1 + 2): stage-2 GAN
# training that IMPROVES audio-domain quality (full-utterance STOI/LSD),
# not just the mel composite — with the rate-consistent 256x vocoder,
# 32768-sample discriminator segments, adversarial warmup, and the
# audio-domain validation gate (quality_score_audio).
#
# Runs on the REAL TPU chip — never run anything else against the chip
# while this is going. Total wall-clock ~40-70 min over the tunnel.
#
# Usage: bash scripts/evidence_r04.sh [output_root]
set -euo pipefail
cd "$(dirname "$0")/.."
ROOT=${1:-outputs/evidence_r04}
EV=artifacts/evidence_r04
mkdir -p "$ROOT" "$EV/wavs"

# 1. Learnable synthetic corpus (air-gapped box; provenance in
#    artifacts/evidence_r03/EVIDENCE.md §0).
if [ ! -d data/synthetic-1000 ]; then
  python scripts/download_data.py --synthetic 1000 --data-dir data --synthetic-profile v1
fi

# 2. Stage-1 acoustic training: flagship config (256x vocoder), 6000
#    steps driven as 3000 + --resume (checkpoint/resume boundary).
python scripts/train.py --config configs/flagship_tpu.yaml \
  data.data_dir=data/synthetic-1000 \
  training.max_steps=3000 training.device_data_cache=true \
  training.validate_every=500 training.save_every=1000 \
  training.log_every=100 \
  paths.output_dir="$ROOT/stage1" \
  paths.checkpoint_dir="$ROOT/stage1/ckpt" \
  paths.log_dir="$ROOT/stage1/logs" \
  system.log_metrics=jsonl
python scripts/train.py --config configs/flagship_tpu.yaml --resume \
  data.data_dir=data/synthetic-1000 \
  training.max_steps=6000 training.device_data_cache=true \
  training.validate_every=500 training.save_every=1000 \
  training.log_every=100 \
  paths.output_dir="$ROOT/stage1" \
  paths.checkpoint_dir="$ROOT/stage1/ckpt" \
  paths.log_dir="$ROOT/stage1/logs" \
  system.log_metrics=jsonl

# 3. Stage-2 GAN, quality recipe (sweep winner, see
#    artifacts/evidence_r04/sweep_summary.md): warm start, 32768-sample
#    segments, envelope-correlation loss, soft spectral-normed adversary
#    with warmup, fine-tuning LR, generator EMA, STOI-weighted gate.
#    configs/stage2_quality.yaml carries the full recipe; validates
#    every 250 with full-utterance STOI/LSD (utt_* metrics) scored on
#    the EMA shadow.
python scripts/train_stage2.py --config configs/stage2_quality.yaml \
  data.data_dir=data/synthetic-1000 \
  training.max_steps=3000 training.device_data_cache=true \
  training.validate_every=250 training.save_every=250 \
  training.max_checkpoints=15 training.log_every=50 \
  training.init_generator_from="$ROOT/stage1/ckpt" \
  system.generate_samples_every=0 \
  paths.output_dir="$ROOT/stage2" \
  paths.checkpoint_dir="$ROOT/stage2/ckpt" \
  paths.log_dir="$ROOT/stage2/logs" \
  system.log_metrics=jsonl

# 4. Early vs best checkpoint on held-out eval with intrusive audio
#    metrics: the done-condition is best > early on STOI AND LSD.
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

echo "evidence collected under $EV"
