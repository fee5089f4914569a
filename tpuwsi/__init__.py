"""tpuwsi — TPU-native self-supervised ViT framework for whole-slide histopathology.

A from-scratch JAX/XLA/Pallas/pjit rebuild of the capabilities of
``noam-mosh/GipMed-Project-Self-Supervised-ViT`` (reference mounted read-only at
/root/reference; see SURVEY.md for the blueprint and file:line parity citations).

Layers (bottom-up, mirroring SURVEY.md §1):
  core/        mesh + sharding setup, RNG streams, precision policy
  ops/         Pallas TPU kernels (fused attention, fused augmentation)
  preprocess/  on-device augmentation recipe registry (transformations.py parity)
  models/      ViT-T/S/B, DINOHead, truncated ResNet-50, MIL attention pooling
  parallel/    partition rules, batch sharding, mesh helpers
  train/       supervised loop, losses, optax optimizers, EMA, orbax checkpoints
  ssl_dino/    DINO student/teacher multi-crop SSL loop
  io/          cohort registry, slide metadata, grid store, tile readers,
               C++ tile-ingest bindings
  infer/       slide walker, AUC aggregation, feature export
  mil/         feature-bag datasets + MIL training over frozen embeddings
  utils/       experiment ledger, labels, balancing, logging
  cli/         reference-compatible command-line entry points
"""

__version__ = "0.1.0"
