#!/usr/bin/env bash
# Submission inference (reference inference.sh / generate_full_submission.sh
# role): latest-checkpoint discovery, dual-subset inference, zip + validate.
set -euo pipefail
cd "$(dirname "$0")/.."

MODEL=${MODEL:-LFMambaX}
SCALE=${SCALE:-4}
OUT=${OUT:-submission}

python inference.py \
  --model_name "$MODEL" \
  --scale_factor "$SCALE" \
  --out "$OUT" \
  "$@"
python validate_submission.py "${OUT}.zip"
