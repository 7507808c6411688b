#!/usr/bin/env bash
# Round-5 quality evidence drive (VERDICT r4 tasks 1+2): corpus v3
# (speech-like formant synthesis, measured STOI floors) + XL (18.5M)
# stage-1 + XL stage-2 quality recipe, then held-out eval of best vs
# early checkpoints. This is the exact sequence that produced
# artifacts/evidence_r05/ — see EVIDENCE.md there for the results.
set -euo pipefail
cd "$(dirname "$0")/.."
OUT=outputs/evidence_r05
ART=artifacts/evidence_r05
mkdir -p "$ART"

# 1. Corpus v3 + its floor measurements (the numbers that make the
#    drive's STOI series meaningful: noise floor < 0.4, oracle ~0.87)
if [ ! -d data/synthetic-v3-1000 ]; then
  python scripts/download_data.py --synthetic 1000 --data-dir data --synthetic-profile v3
fi
python scripts/corpus_floors.py --data-dir data/synthetic-v3-1000 \
  --n 16 --profile v3 --json "$ART/corpus_floors.json"

# 2. Stage-1 XL acoustic training (6000 steps, ~13 min on 1x v5e)
python scripts/train.py --config configs/flagship_xl.yaml \
  data.data_dir=data/synthetic-v3-1000 \
  training.max_steps=6000 training.device_data_cache=true \
  training.validate_every=1000 training.save_every=2000 \
  training.log_every=200 \
  paths.output_dir="$OUT/stage1" \
  paths.checkpoint_dir="$OUT/stage1/ckpt" \
  paths.log_dir="$OUT/stage1/logs"

# 3. Stage-2 XL GAN quality drive (r04 recipe at 18.5M; ~30 min)
python scripts/train_stage2.py --config configs/stage2_xl_quality.yaml \
  training.max_steps=4000 training.validate_every=250 training.save_every=500 \
  training.log_every=100 training.quality_utterances=16 \
  training.init_generator_from="$OUT/stage1/ckpt" \
  paths.output_dir="$OUT/stage2" \
  paths.checkpoint_dir="$OUT/stage2/ckpt" \
  paths.log_dir="$OUT/stage2/logs"

# 4. Held-out audio-domain eval: gate-picked best vs the earliest saved
#    checkpoint (the r3/r4 done-condition comparison)
EARLY=$(ls "$OUT/stage2/ckpt" | grep -E '^[0-9]+$' | sort -n | head -1)
python scripts/evaluate.py --checkpoint "$OUT/stage2/ckpt" --step best \
  --data-dir data/synthetic-v3-1000 --num-samples 64 --audio-metrics \
  --json > "$ART/eval_best.json"
python scripts/evaluate.py --checkpoint "$OUT/stage2/ckpt" --step "$EARLY" \
  --data-dir data/synthetic-v3-1000 --num-samples 64 --audio-metrics \
  --json > "$ART/eval_early.json"

# 5. Archive the series
cp "$OUT/stage1/logs/metrics.csv" "$ART/stage1_metrics.csv"
cp "$OUT/stage2/logs/metrics.csv" "$ART/stage2_metrics.csv"
echo "evidence drive complete -> $ART"
