"""Measured-best ("tuned") TPU step configuration — single source of truth.

Round-3 full-step A/Bs on the real chip (BENCH.md "Round 3") settled the
production DINO-step configuration:

- **XLA MLP** (``use_fused_mlp=False``): with the GEMM region at ~95% of HBM
  peak the Pallas fused-MLP family measures neutral-to-negative in-step
  (117.6 vs 118.4 ms at b96) while Pallas attention stays essential
  (XLA attention: 210.7 ms).
- **bf16 LayerNorm** (``ln_dtype=bfloat16``): halves the residual-stream
  elementwise HBM traffic; measured +~1% full-step.
- **bf16 multicrop augmentation** (``compute_dtype="bfloat16"``): the view
  pipeline is HBM-bound elementwise work (~8.4 ms/step of the b128 step in
  f32); bf16 halves it (6,487→6,556 views/s at b96, 6,369→6,665 at b128).
- **bf16 DINO head GEMMs + loss pair contractions**: measured ≥0 full-step.

bench.py measures exactly this configuration; the CLI SSL loop
(``tpuwsi.cli.train.train_ssl``) builds its step from these same functions,
so a user training on a TPU gets the recorded benchmark step, not a slower
cousin (round-3 VERDICT item 1). ``tests/test_tuned_config.py`` pins the
two surfaces to each other.

Parity anchor: the hot loop these defaults productionize is the reference's
``/root/reference/train.py:1026-1138`` DINO epoch.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp


def tuned_vit_kwargs(on_tpu: bool) -> Dict[str, Any]:
    """ViTConfig overrides for the measured-best step.

    ``gelu_approx`` is NOT set here: it is a checkpoint-parity concern
    (tanh-approx GELU is ~17% faster but changes activations vs timm/DINO
    weights), so callers choose it per use case (from-scratch SSL: True).
    """
    return dict(
        use_pallas_attention=on_tpu,
        use_fused_mlp=False,
        ln_dtype=jnp.bfloat16 if on_tpu else jnp.float32,
        # round-4 A/B (exp_attn4.py): forward kernel saves bf16 softmax
        # probs, backward skips the QK^T + softmax recompute — 101.5 → 99.3
        # ms/step at b96 (+2.3%)
        attn_save_probs=on_tpu,
    )


def tuned_head_kwargs(on_tpu: bool) -> Dict[str, Any]:
    """DINOHead overrides: bf16 GEMMs (fp32 params/accum) on TPU."""
    return dict(dtype=jnp.bfloat16 if on_tpu else jnp.float32)


def tuned_multicrop_kwargs(on_tpu: bool) -> Dict[str, Any]:
    """MultiCropConfig overrides: bf16 augmentation pipeline on TPU."""
    return dict(compute_dtype="bfloat16" if on_tpu else "float32")


def tuned_dino_kwargs(on_tpu: bool) -> Dict[str, Any]:
    """DINOConfig overrides: bf16 loss pair contractions on TPU."""
    return dict(loss_pair_bf16=on_tpu)
