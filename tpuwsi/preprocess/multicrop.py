"""DINO multi-crop augmentation (on-device).

The reference's SSL capability is latent (orphaned DINO model zoo, SURVEY §0,
§2.9); the BASELINE north-star makes it real: 2 global (224²) + N local (96²)
crops per tile through a fused on-device pipeline. Recipe follows the public
DINO multi-crop: random resized crop, horizontal flip, colour jitter (p=0.8),
grayscale (p=0.2), Gaussian blur, solarisation (second global view only),
normalise.

Everything is jit-able with static output shapes: crops are produced by
dynamic-slice + resize, randomness via explicit keys.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from tpuwsi.preprocess import augment as A
from tpuwsi.preprocess.normalize import normalize


@dataclasses.dataclass(frozen=True)
class MultiCropConfig:
    global_size: int = 224
    local_size: int = 96
    n_local: int = 6  # BASELINE north-star: 2 global + 6 local
    global_scale: Tuple[float, float] = (0.4, 1.0)
    local_scale: Tuple[float, float] = (0.05, 0.4)
    norm_type: str = "Ron"
    # Augmentation compute dtype. The whole view pipeline is elementwise and
    # HBM-bandwidth-bound (~8.4 ms/step of the b128 DINO step in f32);
    # "bfloat16" halves that traffic. bf16's 8-bit mantissa is on par with
    # the uint8 quantisation of the source tiles, so view statistics are
    # unchanged to that tolerance. f32 default preserves exact torchvision
    # parity for tests.
    compute_dtype: str = "float32"


def random_resized_crop(key, img, out_size, scale_range, ratio_range=(3 / 4, 4 / 3),
                        hflip_key=None, method="bilinear", interp_key=None):
    """torchvision RandomResizedCrop semantics with static shapes.

    ``hflip_key``: when given, a p=0.5 horizontal flip is folded into the
    sample COORDINATES (reversing the 224-long xs vector) instead of
    reversing the resampled image — bit-identical to flip-after-resize and
    saves a full-image reverse + select pass per view.

    ``method``: 'bilinear' | 'bicubic'. ``interp_key``: when given, pick
    bicubic vs bilinear per image with p=0.5 (timm's 'random' train
    interpolation)."""
    h, w, c = img.shape
    karea, kratio, ky, kx = jax.random.split(key, 4)
    area = h * w * jax.random.uniform(
        karea, (), minval=scale_range[0], maxval=scale_range[1]
    )
    log_ratio = jax.random.uniform(
        kratio,
        (),
        minval=jnp.log(ratio_range[0]),
        maxval=jnp.log(ratio_range[1]),
    )
    ratio = jnp.exp(log_ratio)
    cw = jnp.clip(jnp.round(jnp.sqrt(area * ratio)), 1, w).astype(jnp.int32)
    ch = jnp.clip(jnp.round(jnp.sqrt(area / ratio)), 1, h).astype(jnp.int32)
    # floor(uniform * m) is exactly uniform over 0..m-1 for traced m —
    # randint(0, h) % m is modulo-biased (residues below h % m are up to 2×
    # as likely), skewing every crop toward the top-left
    top = jnp.floor(
        jax.random.uniform(ky, ())
        * jnp.maximum(h - ch + 1, 1).astype(jnp.float32)
    ).astype(jnp.int32)
    left = jnp.floor(
        jax.random.uniform(kx, ())
        * jnp.maximum(w - cw + 1, 1).astype(jnp.float32)
    ).astype(jnp.int32)

    # MXU matmul-based resample of the (top,left,ch,cw) box to
    # (out_size, out_size): sample positions are traced values, static output
    # shape (augment.resample_bilinear).
    ys = top + (jnp.arange(out_size) + 0.5) * ch / out_size - 0.5
    xs = left + (jnp.arange(out_size) + 0.5) * cw / out_size - 0.5
    if hflip_key is not None:
        xs = jnp.where(jax.random.bernoulli(hflip_key, 0.5), xs[::-1], xs)
    pick = (
        jax.random.bernoulli(interp_key, 0.5)
        if interp_key is not None else None
    )
    return A.resample(img, ys, xs, method=method, cubic_pick=pick)


def random_grayscale(key, img, p=0.2):
    from tpuwsi.preprocess.augment import _grayscale

    gray = jnp.broadcast_to(_grayscale(img)[..., None], img.shape)
    return jnp.where(jax.random.bernoulli(key, p), gray, img)


def solarize(key, img, p=0.2, threshold=0.5):
    sol = jnp.where(img >= threshold, 1.0 - img, img)
    return jnp.where(jax.random.bernoulli(key, p), sol, img)


_DINO_JITTER = A.jitter_params(
    brightness=0.4, contrast=0.4, saturation=0.2, hue=0.1
)


def _dino_view(key, img, out_size, scale_range, blur_p, solarize_p):
    kc, kf, kj, kjp, kg, kb, kbp, ks = jax.random.split(key, 8)
    # DINO's DataAugmentationDINO resamples with BICUBIC; the MXU matmul
    # resample costs the same for either kernel (same matrix shapes) —
    # clip the cubic overshoot like PIL's uint8 clamp
    v = jnp.clip(
        random_resized_crop(
            kc, img, out_size, scale_range, hflip_key=kf, method="bicubic"
        ),
        0.0, 1.0,
    )
    jittered = A.color_jitter(kj, v, *_DINO_JITTER)
    v = jnp.where(jax.random.bernoulli(kjp, 0.8), jittered, v)
    v = random_grayscale(kg, v, 0.2)
    # radius-4 blur: DINO draws σ up to 2.0, where a 3-tap kernel truncates
    # most of the Gaussian mass (see augment.gaussian_blur)
    blurred = A.gaussian_blur(kb, v, (0.1, 2.0))
    v = jnp.where(jax.random.bernoulli(kbp, blur_p), blurred, v)
    v = solarize(ks, v, solarize_p)
    return v


def make_multicrop(cfg: MultiCropConfig):
    """Returns fn(key, uint8 batch BHWC) →
    (globals (B, 2, Sg, Sg, 3), locals (B, n_local, Sl, Sl, 3)), normalised."""

    def per_image(key, img):
        keys = jax.random.split(key, 2 + cfg.n_local)
        g0 = _dino_view(keys[0], img, cfg.global_size, cfg.global_scale, 1.0, 0.0)
        g1 = _dino_view(keys[1], img, cfg.global_size, cfg.global_scale, 0.1, 0.2)
        gl = jnp.stack([g0, g1])
        loc = jnp.stack(
            [
                _dino_view(
                    keys[2 + i], img, cfg.local_size, cfg.local_scale, 0.5, 0.0
                )
                for i in range(cfg.n_local)
            ]
        )
        return gl, loc

    def batch_fn(key, images):
        # NOTE: a "merge the 8 per-view pipelines into 2 batched ones"
        # restructure was measured SLOWER end-to-end on v5e (nested-vmap
        # variant 5,983 views/s, jnp.repeat variant 5,886 vs 6,107 for this
        # unrolled form at b96) — XLA already schedules the unrolled view
        # pipelines well, and the merged forms only add layout/broadcast
        # traffic. Keep the simple structure (BENCH.md round-2 log).
        dt = jnp.dtype(cfg.compute_dtype)
        images = (
            images.astype(dt) / jnp.asarray(255.0, dt)
            if images.dtype == jnp.uint8
            else images.astype(dt)
        )
        keys = jax.random.split(key, images.shape[0])
        gl, loc = jax.vmap(per_image)(keys, images)
        return normalize(gl, cfg.norm_type), normalize(loc, cfg.norm_type)

    batch_fn.per_image = per_image  # reference implementation (tests)
    return batch_fn
