"""timm folder-mode transform stack, on device.

Parity: the reference's vanilla trainer builds its pipeline through timm
``create_loader``/``create_transform`` (timm_train.py:614-663):

  train: RandomResizedCrop(scale, ratio) -> hflip/vflip -> ColorJitter
         (suppressed when auto-augment is active) -> normalize
         [-> RandomErasing, wired separately in cli/train.py]
  eval:  Resize(img_size / crop_pct) -> CenterCrop(img_size) -> normalize

Mean/std default to the ImageNet bank and can be overridden per flag
(``--mean``/``--std``), like timm's data-config resolution.

Everything is a jit-able batch function (B, H, W, 3) uint8/float -> f32,
vmapped per image with per-image keys — no host-side PIL.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from tpuwsi.preprocess import augment as A
from tpuwsi.preprocess.multicrop import random_resized_crop
from tpuwsi.preprocess.normalize import MEAN, STD
from tpuwsi.preprocess.recipes import _to_float


def _stats(mean, std, norm_type):
    mean = MEAN[norm_type] if mean is None else tuple(mean)
    std = STD[norm_type] if std is None else tuple(std)
    return jnp.asarray(mean, jnp.float32), jnp.asarray(std, jnp.float32)


def _fit_channels(stat, c: int):
    """Adapt a per-channel stat vector to the image channel count — 1-chan
    (--in-chans 1) folders normalize by the channel-mean of the RGB bank,
    timm's grayscale convention."""
    return stat if stat.shape[0] == c else jnp.full((c,), stat.mean())


def make_timm_train_aug(
    img_size: int,
    scale: Sequence[float] = (0.08, 1.0),
    ratio: Sequence[float] = (3.0 / 4.0, 4.0 / 3.0),
    hflip: float = 0.5,
    vflip: float = 0.0,
    color_jitter: Optional[float] = 0.4,
    mean: Optional[Sequence[float]] = None,
    std: Optional[Sequence[float]] = None,
    norm_type: str = "Imagenet",
    interpolation: str = "bilinear",
    jitter_salt: int = 0,
):
    """fn(key, images): uint8 (B, H, W, 3) -> normalized f32 (B, s, s, 3).

    ``interpolation``: 'bilinear' | 'bicubic' | 'random' (timm
    --train-interpolation: per-image bicubic-vs-bilinear draw).

    ``jitter_salt``: folds into the ColorJitter key ONLY — two instances
    with different salts given the same key draw identical crop/flip but
    independent jitter. This is the --aug-splits secondary-split contract
    (timm AugMixDataset: primary transform applied once, the secondary
    stack independently per split)."""
    jit_params = (
        A.jitter_params(
            brightness=color_jitter, contrast=color_jitter,
            saturation=color_jitter,
        )
        if color_jitter
        else None
    )
    mean_a, std_a = _stats(mean, std, norm_type)
    if interpolation not in ("bilinear", "bicubic", "random"):
        raise ValueError(f"unknown interpolation {interpolation!r}")

    def per_image(key, img):
        kc, kh, kv, kj, ki = jax.random.split(key, 5)
        if jitter_salt:
            kj = jax.random.fold_in(kj, jitter_salt)
        v = random_resized_crop(
            kc, img, img_size, tuple(scale), tuple(ratio),
            method="bilinear" if interpolation == "random" else interpolation,
            interp_key=ki if interpolation == "random" else None,
        )
        if interpolation != "bilinear":
            # bicubic overshoots; PIL/torchvision clamp uint8-backed images
            v = jnp.clip(v, 0.0, 1.0)
        if hflip > 0:
            v = A.random_hflip(kh, v, p=hflip)
        if vflip > 0:
            v = A.random_vflip(kv, v, p=vflip)
        if jit_params is not None and v.shape[-1] == 3:
            # saturation jitter needs RGB; grayscale folders skip ColorJitter
            v = A.color_jitter(kj, v, *jit_params)
        return v

    def batch_fn(key, images):
        images = _to_float(images)
        keys = jax.random.split(key, images.shape[0])
        out = jax.vmap(per_image)(keys, images)
        c = out.shape[-1]
        return (out - _fit_channels(mean_a, c)) / _fit_channels(std_a, c)

    return batch_fn


def make_timm_eval(
    img_size: int,
    crop_pct: float = 0.875,
    mean: Optional[Sequence[float]] = None,
    std: Optional[Sequence[float]] = None,
    norm_type: str = "Imagenet",
    interpolation: str = "bilinear",
):
    """fn(key, images) (key ignored): resize to img_size/crop_pct, center
    crop to img_size, normalize. ``interpolation``: 'bilinear'|'bicubic'
    (timm --interpolation / the model data-config)."""
    mean_a, std_a = _stats(mean, std, norm_type)
    resize_to = max(int(round(img_size / crop_pct)), img_size)

    def per_image(img):
        # the CLI loads folder eval images at resize_to already (square
        # tiles; timm's short-side Resize is equivalent there) — only
        # resample when the source size actually differs
        if img.shape[0] == resize_to and img.shape[1] == resize_to:
            v = img
        elif interpolation == "bicubic":
            n = jnp.arange(resize_to)
            ys = (n + 0.5) * img.shape[0] / resize_to - 0.5
            xs = (n + 0.5) * img.shape[1] / resize_to - 0.5
            v = jnp.clip(A.resample(img, ys, xs, method="bicubic"), 0.0, 1.0)
        else:
            v = A.resize_bilinear(img, resize_to)
        top = (resize_to - img_size) // 2
        return jax.lax.dynamic_slice(
            v, (top, top, 0), (img_size, img_size, v.shape[-1])
        )

    def batch_fn(key, images):
        del key
        images = _to_float(images)
        out = jax.vmap(per_image)(images)
        c = out.shape[-1]
        return (out - _fit_channels(mean_a, c)) / _fit_channels(std_a, c)

    return batch_fn
