"""Truncated ResNet-50 trunk (stages 1–3 + global average pool).

Parity target: the orphaned ``resnet_trunc`` module recovered from
nn_encoder_arch/__pycache__/resnet_trunc.cpython-37.pyc (SURVEY §2.9):
``Bottleneck_Baseline`` blocks, ``ResNet_Trunc_Baseline`` keeping layer1-3
followed by AdaptiveAvgPool (1024-dim features for histopathology encoders),
and a ``resnet50_trunc_baseline(pretrained)`` factory.

TPU-first: NHWC convs (XLA:TPU native layout), fp32 BatchNorm statistics,
bf16 conv compute.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class BottleneckBaseline(nn.Module):
    features: int  # bottleneck planes; output is 4*features
    strides: int = 1
    downsample: bool = False
    # torchvision Bottleneck width rule: the two inner convs run at
    # int(planes * base_width/64) * groups channels — base_width 128 is the
    # wide_resnet*_2 family, (groups, base_width)=(32, 4|8) the resnext
    # family; the 3x3 conv is grouped
    groups: int = 1
    base_width: int = 64
    # flax-convention EMA momentum: 0.9 == torch BatchNorm momentum 0.1
    # (torch: ra = (1-m)*ra + m*batch; flax: ra = m*ra + (1-m)*batch) —
    # the torchvision/timm default, NOT flax's 0.99
    bn_momentum: float = 0.9
    bn_eps: float = 1e-5
    dtype: object = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        width = int(self.features * self.base_width / 64.0) * self.groups
        y = nn.Conv(width, (1, 1), use_bias=False, dtype=self.dtype)(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=self.bn_momentum,
                         epsilon=self.bn_eps, dtype=jnp.float32)(y)
        y = nn.relu(y)
        y = nn.Conv(
            width,
            (3, 3),
            strides=(self.strides, self.strides),
            padding=((1, 1), (1, 1)),
            feature_group_count=self.groups,
            use_bias=False,
            dtype=self.dtype,
        )(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=self.bn_momentum,
                         epsilon=self.bn_eps, dtype=jnp.float32)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False, dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=self.bn_momentum,
                         epsilon=self.bn_eps, dtype=jnp.float32)(y)
        if self.downsample:
            residual = nn.Conv(
                self.features * 4,
                (1, 1),
                strides=(self.strides, self.strides),
                use_bias=False,
                dtype=self.dtype,
                name="downsample_conv",
            )(x)
            residual = nn.BatchNorm(
                use_running_average=not train,
                momentum=self.bn_momentum,
                epsilon=self.bn_eps,
                dtype=jnp.float32,
                name="downsample_bn",
            )(residual)
        return nn.relu(y + residual)


class BasicBlockBaseline(nn.Module):
    """torchvision BasicBlock (resnet18/34): two 3x3 convs, expansion 1."""

    features: int
    strides: int = 1
    downsample: bool = False
    bn_momentum: float = 0.9
    bn_eps: float = 1e-5
    dtype: object = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(
            self.features,
            (3, 3),
            strides=(self.strides, self.strides),
            padding=((1, 1), (1, 1)),
            use_bias=False,
            dtype=self.dtype,
        )(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=self.bn_momentum,
                         epsilon=self.bn_eps, dtype=jnp.float32)(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.features, (3, 3), padding=((1, 1), (1, 1)),
            use_bias=False, dtype=self.dtype,
        )(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=self.bn_momentum,
                         epsilon=self.bn_eps, dtype=jnp.float32)(y)
        if self.downsample:
            residual = nn.Conv(
                self.features,
                (1, 1),
                strides=(self.strides, self.strides),
                use_bias=False,
                dtype=self.dtype,
                name="downsample_conv",
            )(x)
            residual = nn.BatchNorm(
                use_running_average=not train,
                momentum=self.bn_momentum,
                epsilon=self.bn_eps,
                dtype=jnp.float32,
                name="downsample_bn",
            )(residual)
        return nn.relu(y + residual)


class ResNetTruncBaseline(nn.Module):
    """ResNet-50 stem + layers 1-3 + global average pool → 1024-dim.

    With ``stage_sizes=(3, 4, 6, 3)`` and ``num_classes > 0`` this is the
    FULL trainable ResNet-50 classifier (round-3 VERDICT #7: the reference
    can train any timm model by name, train.py:482-495 — resnet50 is the
    canonical CNN of that surface). BatchNorm statistics ride the
    TrainState.batch_stats collection; the train step updates them via
    ``mutable=['batch_stats']`` (see train.supervised.make_train_step).
    """

    stage_sizes: Sequence[int] = (3, 4, 6)  # layer1..layerN of ResNet-50
    # 'bottleneck' (resnet50/101/152, expansion 4) or 'basic'
    # (resnet18/34, expansion 1) — torchvision block taxonomy
    block: str = "bottleneck"
    num_classes: int = 0  # 0 → feature trunk (no head)
    # timm resnet semantics: dropout on the pooled features before fc
    drop_rate: float = 0.0
    # rematerialize each bottleneck block in the backward (timm
    # set_grad_checkpointing, train.py:146,540)
    remat_blocks: bool = False
    # timm --bn-momentum/--bn-eps (flax momentum convention; 0.9 == torch
    # default 0.1 — see BottleneckBaseline)
    bn_momentum: float = 0.9
    bn_eps: float = 1e-5
    # torchvision Bottleneck width rule (wide_resnet*_2: base_width 128;
    # resnext: groups 32) — see BottleneckBaseline
    groups: int = 1
    base_width: int = 64
    dtype: object = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False, deterministic=None):
        if deterministic is not None:
            # ViT-convention alias so the shared train/eval steps can drive
            # BN models with the same apply signature
            train = not deterministic
        x = nn.Conv(
            64,
            (7, 7),
            strides=(2, 2),
            padding=((3, 3), (3, 3)),
            use_bias=False,
            dtype=self.dtype,
            name="conv1",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=self.bn_momentum,
            epsilon=self.bn_eps, dtype=jnp.float32, name="bn1"
        )(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        widths = (64, 128, 256, 512)
        base = (BottleneckBaseline if self.block == "bottleneck"
                else BasicBlockBaseline)
        BlockCls = (
            nn.remat(base, static_argnums=(2,)) if self.remat_blocks else base
        )
        for stage, (blocks, width) in enumerate(zip(self.stage_sizes, widths)):
            for block in range(blocks):
                strides = 2 if stage > 0 and block == 0 else 1
                # torchvision: a projection shortcut whenever the stride or
                # channel count changes — for BasicBlock that means stage 0
                # block 0 has NO downsample (64 in, 64 out, stride 1)
                downsample = block == 0 and (
                    stage > 0 or self.block == "bottleneck"
                )
                kw = (
                    {"groups": self.groups, "base_width": self.base_width}
                    if self.block == "bottleneck" else {}
                )
                x = BlockCls(
                    features=width,
                    strides=strides,
                    downsample=downsample,
                    bn_momentum=self.bn_momentum,
                    bn_eps=self.bn_eps,
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{block}",
                    **kw,
                )(x, train)
        x = jnp.mean(x, axis=(1, 2))  # adaptive avg pool → (B, C)
        x = x.astype(jnp.float32)
        if self.num_classes > 0:
            if self.drop_rate > 0.0:
                x = nn.Dropout(self.drop_rate)(x, deterministic=not train)
            x = nn.Dense(self.num_classes, dtype=jnp.float32, name="fc")(x)
        return x


# torchvision family geometry: name -> (stage_sizes, block, groups,
# base_width)
RESNET_GEOMETRY = {
    "resnet18": ((2, 2, 2, 2), "basic", 1, 64),
    "resnet34": ((3, 4, 6, 3), "basic", 1, 64),
    "resnet50": ((3, 4, 6, 3), "bottleneck", 1, 64),
    "resnet101": ((3, 4, 23, 3), "bottleneck", 1, 64),
    "resnet152": ((3, 8, 36, 3), "bottleneck", 1, 64),
    "wide_resnet50_2": ((3, 4, 6, 3), "bottleneck", 1, 128),
    "wide_resnet101_2": ((3, 4, 23, 3), "bottleneck", 1, 128),
    "resnext50_32x4d": ((3, 4, 6, 3), "bottleneck", 32, 4),
    "resnext101_32x8d": ((3, 4, 23, 3), "bottleneck", 32, 8),
}


def make_resnet(name: str = "resnet50", num_classes: int = 2,
                drop_rate: float = 0.0, remat_blocks: bool = False,
                bn_momentum: float = 0.9, bn_eps: float = 1e-5,
                dtype=jnp.bfloat16):
    """Full trainable ResNet classifier family (timm/torchvision geometry:
    global average pool, pre-fc dropout, Dense head; the reference trains
    any timm model by name, train.py:482-495). Torch weights import via
    ``convert.torch_resnet_trunc_to_flax`` (which follows the target
    tree's stage/block geometry)."""
    stage_sizes, block, groups, base_width = RESNET_GEOMETRY[name]
    return ResNetTruncBaseline(
        stage_sizes=stage_sizes, block=block, num_classes=num_classes,
        drop_rate=drop_rate, remat_blocks=remat_blocks,
        bn_momentum=bn_momentum, bn_eps=bn_eps,
        groups=groups, base_width=base_width, dtype=dtype
    )


def resnet50(num_classes: int = 2, drop_rate: float = 0.0,
             remat_blocks: bool = False, bn_momentum: float = 0.9,
             bn_eps: float = 1e-5, dtype=jnp.bfloat16):
    """Full trainable ResNet-50 classifier (see make_resnet)."""
    return make_resnet(
        "resnet50", num_classes=num_classes, drop_rate=drop_rate,
        remat_blocks=remat_blocks, bn_momentum=bn_momentum, bn_eps=bn_eps,
        dtype=dtype,
    )


def resnet50_trunc_baseline(pretrained=None, dtype=jnp.bfloat16):
    """Factory (nn_encoder_arch parity: ``resnet50_trunc_baseline(pretrained)``
    loads torchvision resnet50 weights via model_zoo — here ``pretrained`` is
    a local torch checkpoint path or an in-memory state_dict, since the TPU
    build takes weights from files, not a download).

    Returns the module when ``pretrained`` is None, else
    ``(module, variables)`` with the converted weights (params + batch_stats).
    """
    model = ResNetTruncBaseline(dtype=dtype)
    if pretrained is None:
        return model
    from tpuwsi.models.convert import (
        load_torch_checkpoint,
        torch_resnet_trunc_to_flax,
    )

    import jax

    state_dict = (
        load_torch_checkpoint(pretrained)
        if isinstance(pretrained, str)
        else pretrained
    )
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3), jnp.float32)
    )
    variables = torch_resnet_trunc_to_flax(state_dict, variables)
    return model, variables
