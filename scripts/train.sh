#!/usr/bin/env bash
# Training launch (reference train.sh / train_v4_5_championship.sh role).
# Gate efficiency first, then train the flagship.
set -euo pipefail
cd "$(dirname "$0")/.."

MODEL=${MODEL:-LFMambaX}
SCALE=${SCALE:-4}
EPOCHS=${EPOCHS:-80}
BATCH=${BATCH:-8}

python check_efficiency.py --model_name "$MODEL" --scale_factor "$SCALE"
python train.py \
  --model_name "$MODEL" \
  --scale_factor "$SCALE" \
  --epoch "$EPOCHS" \
  --batch_size "$BATCH" \
  --use_masked_pretrain 1 \
  "$@"
