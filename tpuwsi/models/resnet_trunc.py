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
    features: int  # bottleneck width; output is 4*features
    strides: int = 1
    downsample: bool = False
    dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype)(x)
        y = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32)(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.features,
            (3, 3),
            strides=(self.strides, self.strides),
            padding=((1, 1), (1, 1)),
            use_bias=False,
            dtype=self.dtype,
        )(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False, dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32)(y)
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
                dtype=jnp.float32,
                name="downsample_bn",
            )(residual)
        return nn.relu(y + residual)


class ResNetTruncBaseline(nn.Module):
    """ResNet-50 stem + layers 1-3 + global average pool → 1024-dim."""

    stage_sizes: Sequence[int] = (3, 4, 6)  # layer1, layer2, layer3
    dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
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
            use_running_average=not train, dtype=jnp.float32, name="bn1"
        )(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        widths = (64, 128, 256)
        for stage, (blocks, width) in enumerate(zip(self.stage_sizes, widths)):
            for block in range(blocks):
                strides = 2 if stage > 0 and block == 0 else 1
                x = BottleneckBaseline(
                    features=width,
                    strides=strides,
                    downsample=(block == 0),
                    name=f"layer{stage + 1}_{block}",
                )(x, train)
        x = jnp.mean(x, axis=(1, 2))  # adaptive avg pool → (B, 1024)
        return x.astype(jnp.float32)


def resnet50_trunc_baseline() -> ResNetTruncBaseline:
    return ResNetTruncBaseline()
