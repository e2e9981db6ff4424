#!/usr/bin/env bash
# Full pipeline (reference run_end_to_end_pipeline.sh:9-17 role):
# verify datasets -> generate h5 -> efficiency gate -> train -> inference
# -> package + validate submission. Stages are idempotent: each checks for
# existing outputs before redoing work.
set -euo pipefail
cd "$(dirname "$0")/.."

DATA_ROOT=${DATA_ROOT:-./datasets}
MODEL=${MODEL:-LFMambaX}
SCALE=${SCALE:-4}
EPOCHS=${EPOCHS:-80}

echo "== [1/6] dataset verification =="
python verify_datasets.py --root "$DATA_ROOT" || {
  echo "datasets incomplete — fetch them first (see README)"; exit 1; }

echo "== [2/6] data generation =="
TAG="SR_5x5_${SCALE}x"
[ -d "data_for_train/$TAG" ] || \
  python generate_data.py train --src "$DATA_ROOT" --out data_for_train \
    --scale_factor "$SCALE"
[ -d "data_for_test/$TAG" ] || \
  python generate_data.py test --src "$DATA_ROOT" --out data_for_test \
    --scale_factor "$SCALE"

echo "== [3/6] efficiency gate =="
python check_efficiency.py --model_name "$MODEL" --scale_factor "$SCALE"

echo "== [4/6] training =="
python train.py --model_name "$MODEL" --scale_factor "$SCALE" --epoch "$EPOCHS"

echo "== [5/6] inference + packaging =="
python inference.py --model_name "$MODEL" --scale_factor "$SCALE" --out submission

echo "== [6/6] validation =="
python validate_submission.py submission.zip
echo "pipeline complete"
