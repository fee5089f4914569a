"""EfficientNet-B0..B7 (timm geometry) — trainable CNN classifiers.

Parity surface: the reference trains any timm model by name
(``create_model(args.model, ...)``, /root/reference/train.py:482-495;
timm_train.py:357). The ResNet family covers the torchvision side; this
module covers timm's flagship CNN family. Geometry follows timm's
``_gen_efficientnet`` arch_def (MBConv stages with SE, SiLU, compound
width/depth scaling, symmetric k//2 padding — timm's default
``pad_type=''``), so timm state_dicts import via
``convert.torch_efficientnet_to_flax``.

TPU-first: NHWC layout throughout (depthwise convs lower to XLA:TPU's
native NHWC path), fp32 BatchNorm statistics, bf16 conv compute by
default, per-block rematerialization for grad checkpointing.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

# timm efficientnet arch_def (b0 base): per stage —
# (block_type, repeats, kernel, stride, expansion, out_channels)
# block types: 'ds' DepthwiseSeparable (no expansion conv), 'ir'
# InvertedResidual. All stages use se_ratio 0.25 of the block INPUT chs.
_B0_STAGES: Tuple[Tuple[str, int, int, int, int, int], ...] = (
    ("ds", 1, 3, 1, 1, 16),
    ("ir", 2, 3, 2, 6, 24),
    ("ir", 2, 5, 2, 6, 40),
    ("ir", 3, 3, 2, 6, 80),
    ("ir", 3, 5, 1, 6, 112),
    ("ir", 4, 5, 2, 6, 192),
    ("ir", 1, 3, 1, 6, 320),
)

# name -> (width_mult, depth_mult); resolution is a training choice, not
# a weight-shape property, so it is not baked into the module
EFFICIENTNET_GEOMETRY = {
    "efficientnet_b0": (1.0, 1.0),
    "efficientnet_b1": (1.0, 1.1),
    "efficientnet_b2": (1.1, 1.2),
    "efficientnet_b3": (1.2, 1.4),
    "efficientnet_b4": (1.4, 1.8),
    "efficientnet_b5": (1.6, 2.2),
    "efficientnet_b6": (1.8, 2.6),
    "efficientnet_b7": (2.0, 3.1),
}


def round_channels(v: float, divisor: int = 8) -> int:
    """timm round_channels: nearest multiple of 8, never below 90%."""
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def _depth(repeats: int, mult: float) -> int:
    return int(math.ceil(repeats * mult))


class SqueezeExcite(nn.Module):
    """timm SqueezeExcite: 1x1 reduce (SiLU) -> 1x1 expand -> sigmoid gate.
    ``rd_chs`` is computed by the caller from the BLOCK input channels."""

    rd_chs: int
    dtype: object = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True).astype(self.dtype)
        s = nn.Conv(self.rd_chs, (1, 1), dtype=self.dtype,
                    name="conv_reduce")(s)
        s = nn.silu(s)
        s = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype,
                    name="conv_expand")(s)
        return x * nn.sigmoid(s.astype(jnp.float32)).astype(x.dtype)


def _bn(train: bool, name: str, momentum: float = 0.9, eps: float = 1e-5):
    # timm EfficientNet BN defaults (torch convention momentum 0.1 →
    # flax EMA momentum 0.9); --bn-momentum/--bn-eps override via the
    # module fields, same torch-semantics rule as the ResNet family
    return nn.BatchNorm(use_running_average=not train, momentum=momentum,
                        epsilon=eps, dtype=jnp.float32, name=name)


class DepthwiseSeparable(nn.Module):
    """timm DepthwiseSeparableConv: dw conv -> bn1 -> act -> SE -> pw
    projection -> bn2 (+ residual when shapes allow)."""

    out_chs: int
    kernel: int = 3
    stride: int = 1
    se_rd_chs: int = 8
    drop_path: float = 0.0
    bn_momentum: float = 0.9
    bn_eps: float = 1e-5
    dtype: object = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        shortcut = x
        in_chs = x.shape[-1]
        pad = self.kernel // 2
        y = nn.Conv(in_chs, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=((pad, pad), (pad, pad)),
                    feature_group_count=in_chs, use_bias=False,
                    dtype=self.dtype, name="conv_dw")(x)
        y = _bn(train, "bn1", self.bn_momentum, self.bn_eps)(y)
        y = nn.silu(y)
        y = SqueezeExcite(self.se_rd_chs, dtype=self.dtype, name="se")(y)
        y = nn.Conv(self.out_chs, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv_pw")(y)
        y = _bn(train, "bn2", self.bn_momentum, self.bn_eps)(y)
        if self.stride == 1 and in_chs == self.out_chs:
            y = _drop_path(y, self.drop_path, train, self) + shortcut
        return y


class InvertedResidual(nn.Module):
    """timm InvertedResidual (MBConv): pw expand -> bn1 -> act -> dw ->
    bn2 -> act -> SE -> pw linear -> bn3 (+ residual when shapes allow)."""

    out_chs: int
    kernel: int = 3
    stride: int = 1
    exp_ratio: int = 6
    se_rd_chs: int = 8
    drop_path: float = 0.0
    bn_momentum: float = 0.9
    bn_eps: float = 1e-5
    dtype: object = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        shortcut = x
        in_chs = x.shape[-1]
        mid = in_chs * self.exp_ratio
        pad = self.kernel // 2
        y = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv_pw")(x)
        y = _bn(train, "bn1", self.bn_momentum, self.bn_eps)(y)
        y = nn.silu(y)
        y = nn.Conv(mid, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=((pad, pad), (pad, pad)),
                    feature_group_count=mid, use_bias=False,
                    dtype=self.dtype, name="conv_dw")(y)
        y = _bn(train, "bn2", self.bn_momentum, self.bn_eps)(y)
        y = nn.silu(y)
        y = SqueezeExcite(self.se_rd_chs, dtype=self.dtype, name="se")(y)
        y = nn.Conv(self.out_chs, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv_pwl")(y)
        y = _bn(train, "bn3", self.bn_momentum, self.bn_eps)(y)
        if self.stride == 1 and in_chs == self.out_chs:
            y = _drop_path(y, self.drop_path, train, self) + shortcut
        return y


def _drop_path(y, rate: float, train: bool, mod: nn.Module):
    """timm drop_path (per-sample stochastic depth) on the residual branch.
    Draws from the repo-wide 'droppath' rng collection (same contract as
    the ViT blocks and the train steps' rngs= plumbing)."""
    if rate <= 0.0 or not train:
        return y
    key = mod.make_rng("droppath")
    import jax

    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, (y.shape[0], 1, 1, 1))
    return jnp.where(mask, y / keep, 0.0).astype(y.dtype)


class EfficientNet(nn.Module):
    """timm EfficientNet trunk + classifier.

    ``num_classes=0`` returns pooled pre-classifier features (timm
    num_features = head channels). BatchNorm stats ride
    ``TrainState.batch_stats`` like the ResNet family.
    """

    width_mult: float = 1.0
    depth_mult: float = 1.0
    num_classes: int = 2
    drop_rate: float = 0.0          # timm --drop: pre-classifier dropout
    drop_path_rate: float = 0.0     # timm --drop-path: stochastic depth
    bn_momentum: float = 0.9        # flax EMA convention (torch 0.1)
    bn_eps: float = 1e-5
    remat_blocks: bool = False
    dtype: object = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False, deterministic=None):
        if deterministic is not None:
            train = not deterministic
        stem = round_channels(32 * self.width_mult)
        x = nn.Conv(stem, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype, name="conv_stem")(x)
        x = _bn(train, "bn1", self.bn_momentum, self.bn_eps)(x)
        x = nn.silu(x)

        # flatten stages into timm's blocks.{stage}.{idx} naming
        total_blocks = sum(_depth(r, self.depth_mult)
                           for _, r, _, _, _, _ in _B0_STAGES)
        bi = 0
        for si, (btype, repeats, k, stride, exp, chs) in enumerate(_B0_STAGES):
            out_chs = round_channels(chs * self.width_mult)
            for r in range(_depth(repeats, self.depth_mult)):
                s = stride if r == 0 else 1
                in_chs = x.shape[-1]
                # timm: SE reduction from the block INPUT channels
                se_rd = max(1, int(in_chs * 0.25))
                dp = self.drop_path_rate * bi / total_blocks
                cls = DepthwiseSeparable if btype == "ds" else InvertedResidual
                if self.remat_blocks:
                    cls = nn.remat(cls, static_argnums=(2,))
                kw = {} if btype == "ds" else {"exp_ratio": exp}
                x = cls(out_chs=out_chs, kernel=k, stride=s, se_rd_chs=se_rd,
                        drop_path=dp, bn_momentum=self.bn_momentum,
                        bn_eps=self.bn_eps, dtype=self.dtype,
                        name=f"blocks_{si}_{r}", **kw)(x, train)
                bi += 1

        head = round_channels(1280 * self.width_mult)
        x = nn.Conv(head, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv_head")(x)
        x = _bn(train, "bn2", self.bn_momentum, self.bn_eps)(x)
        x = nn.silu(x)
        x = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)
        if self.num_classes > 0:
            if self.drop_rate > 0.0:
                x = nn.Dropout(self.drop_rate)(x, deterministic=not train)
            x = nn.Dense(self.num_classes, dtype=jnp.float32,
                         name="classifier")(x)
        return x


def make_efficientnet(name: str = "efficientnet_b0", num_classes: int = 2,
                      drop_rate: float = 0.0, drop_path_rate: float = 0.0,
                      bn_momentum: float = 0.9, bn_eps: float = 1e-5,
                      remat_blocks: bool = False, dtype=jnp.bfloat16):
    if name not in EFFICIENTNET_GEOMETRY:
        raise ValueError(
            f"unknown EfficientNet variant {name!r}; supported: "
            f"{sorted(EFFICIENTNET_GEOMETRY)}")
    width, depth = EFFICIENTNET_GEOMETRY[name]
    return EfficientNet(width_mult=width, depth_mult=depth,
                        num_classes=num_classes, drop_rate=drop_rate,
                        drop_path_rate=drop_path_rate,
                        bn_momentum=bn_momentum, bn_eps=bn_eps,
                        remat_blocks=remat_blocks, dtype=dtype)
