"""Named augmentation recipes — the on-device ``define_transformations``.

Parity: transformations.py:103-208. Every recipe name, parameter value,
op order, and the post-normalisation cutout append (:206-207) are preserved;
the implementation is a single jit-able batch function (per-sample keys via
vmap) instead of a chain of CPU PIL/torchvision ops.

Usage:
    fn = make_recipe('cbnfrsc', train=True, tile_size=256, norm_type='Ron')
    batch = fn(key, uint8_images_nhwc)   # → normalised float32 NHWC
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

from tpuwsi.preprocess import augment as A
from tpuwsi.preprocess.normalize import normalize

RECIPE_NAMES = (
    "flip",
    "rvf",
    "cbnfrsc",
    "cbnfrs",
    "pcbnfrsc",
    "pcbnfrs",
    "aug_receptornet",
    "cbnfr",
    "bnfrsc",
    "bnfrs",
    "frs",
    "none",
)

SCALE_FACTOR = 0.2  # transformations.py:129
BLUR_SIGMA = (1e-7, 1e-1)  # transformations.py:144
NOISE_SIGMA = (0.0, 0.05)  # transformations.py:145
CUTOUT_LEN = 100  # transformations.py:169,207


def _to_float(img):
    return img.astype(jnp.float32) / 255.0 if img.dtype == jnp.uint8 else img


def _cbnfrs_ops(key, img, jitter):
    kj, kb, kn, kf, kr, ks = jax.random.split(key, 6)
    img = A.color_jitter(kj, img, *jitter)
    img = A.gaussian_blur3(kb, img, BLUR_SIGMA)
    img = A.gaussian_noise(kn, img, NOISE_SIGMA)
    img = A.random_vflip(kf, img)
    img = A.random_rot90(kr, img)
    img = A.random_zoom(ks, img, (1.0, 1.0 + SCALE_FACTOR))
    return img


def _single_image_recipe(
    transform_type: str, train: bool, color_param: float
) -> Callable:
    """Returns fn(key, float_img_hwc) → pre-normalisation float image."""

    if not train or transform_type == "none":
        return lambda key, img: img

    if transform_type == "flip":

        def fn(key, img):
            kv, kh = jax.random.split(key)
            return A.random_hflip(kh, A.random_vflip(kv, img))

        return fn

    if transform_type == "rvf":

        def fn(key, img):
            kr, kv = jax.random.split(key)
            return A.random_vflip(kv, A.random_rot90(kr, img))

        return fn

    if transform_type in ("cbnfrsc", "cbnfrs"):
        jitter = A.jitter_params(
            brightness=(0.85, 1.15),
            contrast=(0.75, 1.25),
            saturation=0.1,
            hue=(-0.1, 0.1),
        )
        return functools.partial(_cbnfrs_ops, jitter=jitter)

    if transform_type in ("pcbnfrsc", "pcbnfrs"):
        jitter = A.jitter_params(
            brightness=color_param,
            contrast=color_param * 2,
            saturation=color_param,
            hue=color_param,
        )
        return functools.partial(_cbnfrs_ops, jitter=jitter)

    if transform_type == "cbnfr":
        jitter = A.jitter_params(
            brightness=(0.85, 1.15),
            contrast=(0.75, 1.25),
            saturation=0.1,
            hue=(-0.1, 0.1),
        )

        def fn(key, img):
            kj, kb, kn, kf, kr = jax.random.split(key, 5)
            img = A.color_jitter(kj, img, *jitter)
            img = A.gaussian_blur3(kb, img, BLUR_SIGMA)
            img = A.gaussian_noise(kn, img, NOISE_SIGMA)
            img = A.random_vflip(kf, img)
            img = A.random_rot90(kr, img)
            return img

        return fn

    if transform_type in ("bnfrsc", "bnfrs"):

        def fn(key, img):
            kb, kn, kf, kr, ks = jax.random.split(key, 5)
            img = A.gaussian_blur3(kb, img, BLUR_SIGMA)
            img = A.gaussian_noise(kn, img, NOISE_SIGMA)
            img = A.random_vflip(kf, img)
            img = A.random_rot90(kr, img)
            img = A.random_zoom(ks, img, (1.0, 1.0 + SCALE_FACTOR))
            return img

        return fn

    if transform_type == "frs":

        def fn(key, img):
            kf, kr, ks = jax.random.split(key, 3)
            img = A.random_vflip(kf, img)
            img = A.random_rot90(kr, img)
            img = A.random_zoom(ks, img, (1.0, 1.0 + SCALE_FACTOR))
            return img

        return fn

    if transform_type == "aug_receptornet":
        jitter = A.jitter_params(
            brightness=64.0 / 255, contrast=0.75, saturation=0.25, hue=0.04
        )

        def fn(key, img):
            kj, kh, kr, kc, km = jax.random.split(key, 5)
            img = A.color_jitter(kj, img, *jitter)
            img = A.random_hflip(kh, img)
            img = A.random_rot90(kr, img)
            # Cutout + mean-pixel happen PRE-normalisation for this recipe
            # (transformations.py:162-171).
            img = A.cutout(kc, img, CUTOUT_LEN, fill=0.0)
            img = A.mean_pixel_regularization(km, img)
            return img

        return fn

    raise ValueError(f"unknown transform type {transform_type!r}")


def make_recipe(
    transform_type: str,
    train: bool,
    tile_size: int = 256,
    color_param: float = 0.1,
    norm_type: str = "Ron",
) -> Callable[[jax.Array, jax.Array], jax.Array]:
    """Build a batch augmentation function for a named recipe.

    Returns fn(key, images) where images is (B, H, W, 3) uint8 or float in
    [0,1]; output is normalised float32 (B, H, W, 3).
    """
    per_image = _single_image_recipe(transform_type, train, color_param)
    post_norm_cutout = train and transform_type in (
        "cbnfrsc",
        "bnfrsc",
        "c_0_05_bnfrsc",  # dead in the reference too (transformations.py:206 lists it; no branch builds it) — kept for the same latent parity
        "pcbnfrsc",
    )

    def batch_fn(key, images):
        images = _to_float(images)
        b = images.shape[0]
        keys = jax.random.split(key, b)
        out = jax.vmap(per_image)(keys, images)
        out = normalize(out, norm_type)
        if post_norm_cutout:
            ckeys = jax.vmap(lambda k: jax.random.fold_in(k, 7))(keys)
            out = jax.vmap(lambda k, im: A.cutout(k, im, CUTOUT_LEN, fill=0.0))(
                ckeys, out
            )
        return out

    return batch_fn
