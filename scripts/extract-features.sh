#!/bin/bash
# Tile-feature extraction for MIL (train.py --extract_features parity).
set -e
cd "$(dirname "$0")/.."
python -m tpuwsi.cli.train \
  --model vit_small_patch16_224_dino \
  --dataset TCGA \
  -tar ER \
  -tf 1 \
  -ef \
  -nt 500 -tpi 500 \
  --output runs \
  "$@"
