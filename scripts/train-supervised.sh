#!/bin/bash
# Supervised receptor-status training (replaces sbatch-supervised.sh).
set -e
cd "$(dirname "$0")/.."
python -m tpuwsi.cli.train \
  --model vit_small_patch16_224_dino \
  --dataset CAT \
  -tar ER \
  -tf 1 \
  --transform_type pcbnfrsc \
  --mag 10 \
  -b 256 \
  --epochs 500 \
  --opt sgd \
  --lr-base 0.1 \
  --smoothing 0.1 \
  --model-ema \
  --output runs \
  "$@"
