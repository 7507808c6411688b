#!/usr/bin/env bash
# Round-4 stage-2 quality ablation (VERDICT r3 task 1): which lever stops
# the STOI regression? Each variant warm-starts from the SAME stage-1
# checkpoint and runs a short GAN leg with full-utterance STOI/LSD
# measured every validation (the new utt_* validation metrics).
#
# Runs on the REAL TPU chip — never run anything else against the chip
# while this is going.
#
# Usage: bash scripts/sweep_stage2_quality.sh [stage1_ckpt] [out_root]
set -euo pipefail
cd "$(dirname "$0")/.."
S1=${1:-outputs/evidence_r04/stage1/ckpt}
ROOT=${2:-outputs/sweep_stage2}
STEPS=${STEPS:-1200}
VAL=${VAL:-200}
# r04 sweep corpus: the v1 profile (generate explicitly — the
# download_data.py default profile has moved on to v3)
if [ ! -d data/synthetic-1000 ]; then
  python scripts/download_data.py --synthetic 1000 --data-dir data --synthetic-profile v1
fi

run () {
  name=$1; shift
  echo "=== sweep variant: $name ($*) ==="
  python scripts/train_stage2.py --config configs/flagship_tpu.yaml \
    data.data_dir=data/synthetic-1000 \
    training.max_steps="$STEPS" training.device_data_cache=true \
    training.validate_every="$VAL" training.save_every=100000 \
    training.log_every=100 training.quality_utterances=16 \
    training.init_generator_from="$S1" \
    system.generate_samples_every=0 \
    paths.output_dir="$ROOT/$name" \
    paths.checkpoint_dir="$ROOT/$name/ckpt" \
    paths.log_dir="$ROOT/$name/logs" \
    system.log_metrics=jsonl \
    "$@"
}

# A: r03 configuration replayed (8192-sample segments, no warmup) — the
#    regression baseline, now with utt_stoi measured per validation.
run A_base8k   training.audio_segment_len=8192 training.adversarial_warmup_steps=0
# B: longer segments only (~1.5 s spans prosodic structure).
run B_seg32k   training.audio_segment_len=32768 training.adversarial_warmup_steps=0
# C: warmup only (adv+FM ramp 0->1 over 600 steps).
run C_warm     training.audio_segment_len=8192 training.adversarial_warmup_steps=600
# D: both levers.
run D_seg32k_warm training.audio_segment_len=32768 training.adversarial_warmup_steps=600
# E: both + softer adversary (adv 0.1, FM 1.0).
run E_soft_adv training.audio_segment_len=32768 training.adversarial_warmup_steps=600 \
  training.adversarial_loss_weight=0.1 training.feature_matching_weight=1.0

ROOT="$ROOT" python - <<'EOF'
import json, glob, os
root = os.environ.get("ROOT", "outputs/sweep_stage2")
for d in sorted(glob.glob(f"{root}/*/logs/*.jsonl")):
    name = d.split("/")[-3]
    rows = [json.loads(l) for l in open(d)]
    vals = [r for r in rows if "val_utt_stoi" in r]
    series = [(r.get("step"), round(r["val_utt_stoi"], 4),
               round(r.get("val_utt_lsd", float("nan")), 3)) for r in vals]
    print(name, "(step, stoi, lsd):", series)
EOF
