"""Occlusion-square saliency sweeps.

Parity: utils.py:682-767 ``EmbedSquare`` — slide a size×size square (values:
normalized Black/White/Gray pixel, utils.py:691-702) across the tile at a
given stride and emit the occluded variants for scoring; saliency = score
drop per square position.

TPU-first: all positions are generated in ONE vmapped batch on device (the
reference builds 1024 tensors in a Python loop on CPU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Normalized pixel values from utils.py:691-702 (channels-last order).
SQUARE_COLORS = {
    "Black": (-7.9982, -4.7133, -11.8895),
    "White": (0.8907, 0.9977, 0.8170),
    "Gray": (-3.5712, -1.8690, -5.5611),
}


def occlusion_positions(tile_size: int, size: int = 16, stride: int = 8):
    n = tile_size // stride
    pos = [(r * stride, c * stride) for r in range(n) for c in range(n)]
    return jnp.asarray(pos, dtype=jnp.int32)


def embed_squares(image: jax.Array, size: int = 16, stride: int = 8,
                  color: str = "Gray") -> jax.Array:
    """image: (H, W, 3) normalized → (P, H, W, 3) occluded variants, P = the
    full stride grid. Square extends past the border like the reference's
    padded implementation (clipped)."""
    h, w, _ = image.shape
    fill = jnp.asarray(SQUARE_COLORS[color], dtype=image.dtype)
    positions = occlusion_positions(h, size, stride)
    rows = jnp.arange(h)
    cols = jnp.arange(w)

    def occlude(pos):
        r0, c0 = pos[0], pos[1]
        rmask = (rows >= r0) & (rows < r0 + size)
        cmask = (cols >= c0) & (cols < c0 + size)
        hole = rmask[:, None] & cmask[None, :]
        return jnp.where(hole[..., None], fill, image)

    return jax.vmap(occlude)(positions)


def occlusion_saliency(apply_fn, params, image: jax.Array, class_index: int = 1,
                       size: int = 16, stride: int = 8, color: str = "Gray",
                       batch_size: int = 256) -> jax.Array:
    """Saliency map: baseline class prob minus prob under each occlusion,
    reshaped to the stride grid."""
    variants = embed_squares(image, size, stride, color)
    base = jax.nn.softmax(apply_fn(params, image[None]))[0, class_index]
    probs = []
    for start in range(0, variants.shape[0], batch_size):
        chunk = variants[start : start + batch_size]
        probs.append(jax.nn.softmax(apply_fn(params, chunk))[:, class_index])
    drop = base - jnp.concatenate(probs)
    n = image.shape[0] // stride
    return drop.reshape(n, n)
