"""Model registry: timm-style name → model factory.

Parity target: ``create_model(args.model, ...)`` at train.py:482-495 with the
names used by the run book (train_instruct.txt:17,20:
``vit_small_patch16_224_dino``, and timm classics like
``vit_tiny_patch16_224`` / ``vit_base_patch16_224``). ``_dino`` names map to
the same geometry; pretrained-weight loading is a checkpoint concern
(tpuwsi.train.checkpoint), not a registry one.
"""

from __future__ import annotations

import re
from typing import Optional

import jax.numpy as jnp

from tpuwsi.models.resnet_trunc import ResNetTruncBaseline
from tpuwsi.models.vit import (
    ViTConfig,
    VisionTransformer,
    vit_base,
    vit_large,
    vit_small,
    vit_tiny,
)

_VIT_FACTORIES = {
    "tiny": vit_tiny,
    "small": vit_small,
    "base": vit_base,
    "large": vit_large,
}

_NAME_RE = re.compile(
    r"^vit_(?P<size>tiny|small|base|large)_patch(?P<patch>\d+)_(?P<img>\d+)(?P<dino>_dino)?$"
)

_RESNET_NAMES = (
    "resnet18", "resnet34", "resnet50", "resnet101", "resnet152",
    "wide_resnet50_2", "wide_resnet101_2",
    "resnext50_32x4d", "resnext101_32x8d",
)


def list_models() -> list:
    """Every name ``create_model`` accepts (timm ``list_models`` surface).

    ViT names follow ``vit_{tiny|small|base|large}_patch{P}_{S}[_dino]``
    for any patch/img size; the listing enumerates the run-book sizes.
    """
    from tpuwsi.models.efficientnet import EFFICIENTNET_GEOMETRY

    vits = [
        f"vit_{size}_patch{p}_224{suffix}"
        for size in _VIT_FACTORIES
        for p in (8, 16, 32)
        for suffix in ("", "_dino")
    ]
    return (vits + ["resnet50_trunc"] + list(_RESNET_NAMES)
            + sorted(EFFICIENTNET_GEOMETRY))


def parse_model_name(name: str) -> ViTConfig:
    """Parse a ViT name. Callers wanting the full zoo (CNNs included) go
    through ``create_model``; direct callers (e.g. the SSL backbone path)
    accept ViTs only, so the error lists only the ViT pattern."""
    m = _NAME_RE.match(name)
    if not m:
        raise ValueError(
            f"not a ViT model name: {name!r} — expected "
            "vit_{tiny|small|base|large}_patch{P}_{S}[_dino]"
        )
    return _VIT_FACTORIES[m.group("size")](
        patch_size=int(m.group("patch")), img_size=int(m.group("img"))
    )


def create_model(
    name: str,
    num_classes: int = 2,
    drop_rate: float = 0.0,
    drop_path_rate: float = 0.0,
    img_size: Optional[int] = None,
    dtype=jnp.bfloat16,
    use_pallas_attention: bool = True,
    grad_checkpointing: bool = False,
    bn_momentum=None,
    bn_eps=None,
    attn_save_probs: bool = False,
    quant_int8: bool = False,
) -> VisionTransformer:
    """Build a ViT by timm-style name (or 'resnet50_trunc').

    ``grad_checkpointing`` is timm's --grad-checkpointing
    (set_grad_checkpointing, train.py:146,540): rematerialize each block in
    the backward instead of keeping its residuals — here via flax
    ``nn.remat`` on the block (works for both unrolled and scanned stacks).
    """
    if quant_int8 and not name.startswith("vit_"):
        raise ValueError(
            "--quantize int8 covers the ViT family (int8 body GEMMs, "
            f"ops/quant.py); {name} runs unquantized — drop --quantize"
        )
    if name in ("resnet50_trunc", "resnet50_trunc_baseline"):
        return ResNetTruncBaseline(dtype=dtype)
    if name.startswith("efficientnet_b"):
        # timm's flagship CNN family (train.py:482-495 create_model
        # surface): MBConv + SE + SiLU, compound width/depth scaling.
        # BatchNorm stats ride TrainState.batch_stats like the resnets;
        # drop_path is real per-block stochastic depth.
        from tpuwsi.models.efficientnet import make_efficientnet

        # --bn-momentum arrives in TORCH convention (timm default 0.1);
        # flax EMA momentum is its complement
        return make_efficientnet(
            name, num_classes=num_classes, drop_rate=drop_rate,
            drop_path_rate=drop_path_rate,
            bn_momentum=1.0 - bn_momentum if bn_momentum is not None else 0.9,
            bn_eps=bn_eps if bn_eps is not None else 1e-5,
            remat_blocks=grad_checkpointing, dtype=dtype,
        )
    if name in _RESNET_NAMES:
        # full trainable CNN classifier family (train.py:482-495
        # create_model surface; torchvision geometry). BatchNorm stats ride
        # TrainState.batch_stats — the CLI loops detect them at init.
        # drop_rate → timm's pre-fc dropout; grad_checkpointing remats each
        # block. drop_path_rate has no torchvision-resnet analog and is
        # ignored (as in torchvision).
        from tpuwsi.models.resnet_trunc import make_resnet

        # --bn-momentum arrives in TORCH convention (timm/torchvision
        # default 0.1); flax EMA momentum is its complement
        return make_resnet(
            name, num_classes=num_classes, drop_rate=drop_rate,
            remat_blocks=grad_checkpointing,
            bn_momentum=1.0 - bn_momentum if bn_momentum is not None else 0.9,
            bn_eps=bn_eps if bn_eps is not None else 1e-5,
            dtype=dtype,
        )
    try:
        cfg = parse_model_name(name)
    except ValueError:
        raise ValueError(
            f"unknown model name: {name!r} — expected "
            "vit_{tiny|small|base|large}_patch{P}_{S}[_dino], a resnet/"
            "wide_resnet/resnext variant, efficientnet_b0..b7, or "
            "resnet50_trunc (tpuwsi.models.registry.list_models())"
        ) from None
    import dataclasses

    cfg = dataclasses.replace(
        cfg,
        num_classes=num_classes,
        drop_rate=drop_rate,
        drop_path_rate=drop_path_rate,
        img_size=img_size or cfg.img_size,
        dtype=dtype,
        use_pallas_attention=use_pallas_attention,
        remat_blocks=grad_checkpointing,
        # saved-probs attention backward (core/tuned.py): numerics-neutral
        # in the forward, grads tested equal to the recompute path — safe
        # for timm-checkpoint fine-tuning. Ignored by the CNN families.
        attn_save_probs=attn_save_probs,
        quant_int8=quant_int8,
    )
    return VisionTransformer(cfg)
