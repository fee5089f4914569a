#!/bin/bash
# DINO SSL training on a TPU VM (replaces sbatch-ssl.sh + torchrun:
# JAX is single-process-per-host; multi-host pods launch this same script on
# every host and jax.distributed handles the rest).
set -e
cd "$(dirname "$0")/.."
python -m tpuwsi.cli.train \
  --ssl \
  --model vit_small_patch16_224_dino \
  --dataset CAT \
  -tar ER \
  -tf 1 \
  --transform_type pcbnfrsc \
  --mag 10 \
  -b 256 \
  --epochs 300 \
  --warmup-epochs 10 \
  --opt adamw \
  --lr-base 0.0005 \
  --weight-decay 0.04 \
  --output runs \
  "$@"
