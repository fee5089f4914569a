"""On-device augmentation primitives (JAX, jit/vmap-able).

TPU-native replacement for the reference's CPU-side torchvision/skimage/PIL
augmentation ops (transformations.py:10-100 custom ops and the torchvision
calls at :119-207). Each op takes an explicit PRNG key and a single HWC float
image in [0, 1]; recipes vmap them over the batch with per-sample keys, so the
whole augmentation stack runs inside the jitted train step on device —
replacing the reference's DataLoader-worker CPU hot spot (SURVEY §3.2).

Semantics parity notes (distribution-level, per SURVEY §7 hard-part 2):
- ColorJitter factor sampling matches torchvision: brightness/contrast/
  saturation factors ~ U[lo, hi], hue shift ~ U[-h, h]; ops applied in
  fixed b→c→s→h order (torchvision randomises the order; the marginal
  distributions are preserved).
- GaussianBlur(3, σ∈[1e-7, 0.1]) — 3×3 separable kernel, per-sample σ
  (transformations.py:144).
- Gaussian noise σ∈[0, 0.05] adds N(0, σ) in [0,1] space then clips and
  re-quantises to the uint8 grid, matching skimage random_noise + uint8
  round-trip (transformations.py:78-88).
- MyRotation picks uniformly from {0°, 90°, 180°, 270°} (transformations.py:48).
- RandomAffine(degrees=0, scale=(1, 1.2)) — pure zoom about the centre with
  bilinear resampling (transformations.py:148).
- Cutout(n_holes=1, length=100) zeroes a clipped square; in the reference the
  cutout is appended AFTER normalisation (transformations.py:206-207), so the
  hole is 0 in normalised space — preserved by recipe ordering.
- MyMeanPixelRegularization replaces the whole image with a fixed mean pixel
  with p=0.75 (transformations.py:91-100).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpuwsi.preprocess.normalize import MEAN_PIXEL

# ---------------------------------------------------------------------------
# color ops (torchvision functional parity)
# ---------------------------------------------------------------------------

def _grayscale(img):
    # NOTE: written as an elementwise weighted sum, NOT `img @ w` — a
    # (H, W, 3) x (3,) dot with contraction dim 3 triggers a pathological
    # MXU layout search in XLA:TPU (observed 250+ s compiles).
    return (
        img[..., 0] * 0.2989 + img[..., 1] * 0.587 + img[..., 2] * 0.114
    )


def _blend(a, b, factor):
    return a * factor + b * (1.0 - factor)


def adjust_brightness(img, factor):
    return jnp.clip(img * factor, 0.0, 1.0)


def adjust_contrast(img, factor):
    gray_mean = jnp.mean(_grayscale(img))
    return jnp.clip(_blend(img, gray_mean, factor), 0.0, 1.0)


def adjust_saturation(img, factor):
    gray = _grayscale(img)[..., None]
    return jnp.clip(_blend(img, gray, factor), 0.0, 1.0)


def _rgb_to_hsv(img):
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-12), 0.0)
    safe_delta = jnp.where(delta == 0, 1.0, delta)
    rc = (maxc - r) / safe_delta
    gc = (maxc - g) / safe_delta
    bc = (maxc - b) / safe_delta
    h = jnp.where(
        maxc == r,
        bc - gc,
        jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc),
    )
    h = jnp.where(delta == 0, 0.0, h)
    h = (h / 6.0) % 1.0
    return jnp.stack([h, s, v], axis=-1)


def _hsv_to_rgb(hsv):
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - f * s)
    t = v * (1.0 - (1.0 - f) * s)
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def adjust_hue(img, shift):
    hsv = _rgb_to_hsv(img)
    h = (hsv[..., 0] + shift) % 1.0
    return _hsv_to_rgb(jnp.stack([h, hsv[..., 1], hsv[..., 2]], axis=-1))


def color_jitter(key, img, brightness, contrast, saturation, hue):
    """brightness/contrast/saturation: (lo, hi) tuples or None; hue: (lo, hi)."""
    kb, kc, ks, kh = jax.random.split(key, 4)
    if brightness is not None:
        f = jax.random.uniform(kb, (), minval=brightness[0], maxval=brightness[1])
        img = adjust_brightness(img, f)
    if contrast is not None:
        f = jax.random.uniform(kc, (), minval=contrast[0], maxval=contrast[1])
        img = adjust_contrast(img, f)
    if saturation is not None:
        f = jax.random.uniform(ks, (), minval=saturation[0], maxval=saturation[1])
        img = adjust_saturation(img, f)
    if hue is not None:
        f = jax.random.uniform(kh, (), minval=hue[0], maxval=hue[1])
        img = adjust_hue(img, f)
    return img


def jitter_params(brightness=None, contrast=None, saturation=None, hue=None):
    """torchvision ColorJitter argument normalisation: scalar b → (1-b, 1+b)
    clipped at 0; scalar hue h → (-h, h)."""

    def sym(v):
        if v is None:
            return None
        if isinstance(v, (tuple, list)):
            return tuple(v)
        return (max(0.0, 1.0 - v), 1.0 + v)

    def hue_rng(v):
        if v is None:
            return None
        if isinstance(v, (tuple, list)):
            return tuple(v)
        return (-v, v)

    return sym(brightness), sym(contrast), sym(saturation), hue_rng(hue)


# ---------------------------------------------------------------------------
# blur / noise
# ---------------------------------------------------------------------------


def gaussian_blur3(key, img, sigma_range=(1e-7, 1e-1)):
    """3×3 separable Gaussian blur with per-sample σ ~ U[range]."""
    sigma = jax.random.uniform(
        key, (), minval=sigma_range[0], maxval=sigma_range[1]
    )
    x = jnp.array([-1.0, 0.0, 1.0])
    w = jnp.exp(-0.5 * (x / sigma) ** 2)
    w = (w / jnp.sum(w)).astype(img.dtype)
    # Separable blur along H then W with edge padding (torchvision reflect
    # padding differs only on the 1-px border).
    pad_h = jnp.pad(img, ((1, 1), (0, 0), (0, 0)), mode="edge")
    img = (
        pad_h[:-2] * w[0] + pad_h[1:-1] * w[1] + pad_h[2:] * w[2]
    )
    pad_w = jnp.pad(img, ((0, 0), (1, 1), (0, 0)), mode="edge")
    img = pad_w[:, :-2] * w[0] + pad_w[:, 1:-1] * w[1] + pad_w[:, 2:] * w[2]
    return img


def gaussian_blur(key, img, sigma_range):
    """FULL (untruncated) separable Gaussian blur with per-sample σ ~
    U[range], applied as two small MXU matmuls.

    The 3-tap kernel (gaussian_blur3) is only adequate for the GipMed
    recipes' σ ≤ 0.1 — at DINO's σ up to 2.0 it truncates ~60% of the
    Gaussian mass and the max-strength blur degenerates toward a weak box
    filter. Building the dense (S, S) row-normalized Gaussian operator from
    the traced σ and contracting it over each axis gives the exact kernel
    at ANY σ and rides the MXU (a 224² view costs ~2×33 MFLOP ≈ free)
    instead of 2·(2r+1) shifted VPU adds. Row normalization at the borders
    ≈ PIL's renormalized truncation."""
    sigma = jax.random.uniform(
        key, (), minval=sigma_range[0], maxval=sigma_range[1]
    )
    h, w = img.shape[0], img.shape[1]

    def op(n):
        i = jnp.arange(n, dtype=jnp.float32)
        d = i[:, None] - i[None, :]
        b = jnp.exp(-0.5 * (d / sigma) ** 2)
        return (b / b.sum(axis=1, keepdims=True)).astype(img.dtype)

    by = op(h)
    bx = by if w == h else op(w)
    tmp = jnp.einsum(
        "oh,hwc->owc", by, img, preferred_element_type=jnp.float32
    ).astype(img.dtype)
    return jnp.einsum(
        "pw,owc->opc", bx, tmp, preferred_element_type=jnp.float32
    ).astype(img.dtype)


def gaussian_noise(key, img, sigma_range=(0.0, 0.05)):
    ks, kn = jax.random.split(key)
    stdev = jax.random.uniform(
        ks, (), minval=sigma_range[0], maxval=sigma_range[1]
    )
    noisy = img + stdev * jax.random.normal(kn, img.shape, img.dtype)
    noisy = jnp.clip(noisy, 0.0, 1.0)
    # uint8 round-trip parity (transformations.py:85).
    return jnp.floor(noisy * 255.0) / 255.0


# ---------------------------------------------------------------------------
# geometric ops
# ---------------------------------------------------------------------------


def random_vflip(key, img, p=0.5):
    return jnp.where(jax.random.bernoulli(key, p), img[::-1], img)


def random_hflip(key, img, p=0.5):
    return jnp.where(jax.random.bernoulli(key, p), img[:, ::-1], img)


def random_rot90(key, img):
    """Uniform choice of {0, 90, 180, 270}° (MyRotation parity)."""
    k = jax.random.randint(key, (), 0, 4)
    return jax.lax.switch(
        k,
        [
            lambda x: x,
            lambda x: jnp.rot90(x, 1, axes=(0, 1)),
            lambda x: jnp.rot90(x, 2, axes=(0, 1)),
            lambda x: jnp.rot90(x, 3, axes=(0, 1)),
        ],
        img,
    )


def interp_matrix(coords, in_size: int):
    """Bilinear-interpolation matrix M (out, in): M @ img samples img rows at
    fractional positions ``coords`` with edge clamping.

    TPU-idiomatic resampling: gathers are slow on the VPU, so bilinear
    resampling is expressed as two small matmuls that ride the MXU —
    ``out = My @ img @ Mxᵀ`` (per channel).
    """
    out = coords.shape[0]
    y0f = jnp.clip(jnp.floor(coords), 0, in_size - 1)
    y1f = jnp.clip(y0f + 1, 0, in_size - 1)
    w = jnp.clip(coords - y0f, 0.0, 1.0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (out, in_size), 1)
    y0 = y0f.astype(jnp.int32)[:, None]
    y1 = y1f.astype(jnp.int32)[:, None]
    m = (cols == y0) * (1.0 - w)[:, None] + (cols == y1) * w[:, None]
    return m


def _cubic_w(t, a=-0.5):
    """Cubic-convolution kernel (Keys, a=-0.5 — PIL/torch BICUBIC)."""
    at = jnp.abs(t)
    w1 = ((a + 2) * at - (a + 3)) * at * at + 1.0
    w2 = a * (((at - 5) * at + 8) * at - 4)
    return jnp.where(at <= 1, w1, jnp.where(at < 2, w2, 0.0))


def interp_matrix_cubic(coords, in_size: int):
    """Bicubic-interpolation matrix (out, in), same contract as
    ``interp_matrix``: 4-tap cubic weights per output position, edge taps
    clamp-accumulated (replicate padding). Pure interpolation — no
    antialias prefilter, matching torch ``interpolate(antialias=False)``;
    the bilinear path has the same property."""
    out = coords.shape[0]
    base = jnp.floor(coords)
    cols = jax.lax.broadcasted_iota(jnp.int32, (out, in_size), 1)
    m = jnp.zeros((out, in_size), jnp.float32)
    for k in (-1, 0, 1, 2):
        idx = jnp.clip(base + k, 0, in_size - 1).astype(jnp.int32)[:, None]
        w = _cubic_w(coords - (base + k))[:, None]
        m = m + (cols == idx) * w
    return m


def resample(img, ys, xs, method: str = "bilinear", cubic_pick=None):
    """Sample img (H, W, C) at row positions ys (Ho,) and col positions
    xs (Wo,) via MXU matmuls → (Ho, Wo, C).

    ``method``: 'bilinear' | 'bicubic' (static). ``cubic_pick``: optional
    traced bool selecting bicubic over bilinear per call — timm's 'random'
    train interpolation as a per-image draw (the matrices are tiny; the
    two MXU matmuls are shared)."""
    h, w, _ = img.shape
    # bf16 inputs ride the MXU natively (f32 accumulation via
    # preferred_element_type); everything else computes in f32 as before.
    dt = jnp.bfloat16 if img.dtype == jnp.bfloat16 else jnp.float32
    if cubic_pick is not None:
        my = jnp.where(cubic_pick, interp_matrix_cubic(ys, h),
                       interp_matrix(ys, h))
        mx = jnp.where(cubic_pick, interp_matrix_cubic(xs, w),
                       interp_matrix(xs, w))
    elif method == "bicubic":
        my, mx = interp_matrix_cubic(ys, h), interp_matrix_cubic(xs, w)
    elif method == "bilinear":
        my, mx = interp_matrix(ys, h), interp_matrix(xs, w)
    else:
        raise ValueError(f"unknown interpolation {method!r}")
    my = my.astype(dt)
    mx = mx.astype(dt)
    tmp = jnp.einsum(
        "oh,hwc->owc", my, img.astype(dt),
        preferred_element_type=jnp.float32,
    ).astype(dt)
    return jnp.einsum(
        "pw,owc->opc", mx, tmp, preferred_element_type=jnp.float32
    ).astype(img.dtype)


def resample_bilinear(img, ys, xs):
    """Sample img (H, W, C) at row positions ys (Ho,) and col positions
    xs (Wo,) via MXU matmuls → (Ho, Wo, C)."""
    return resample(img, ys, xs, method="bilinear")


def random_zoom(key, img, scale_range=(1.0, 1.2)):
    """RandomAffine(degrees=0, scale=s): zoom about centre, bilinear."""
    s = jax.random.uniform(key, (), minval=scale_range[0], maxval=scale_range[1])
    h, w, _ = img.shape
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    ys = (jnp.arange(h) - cy) / s + cy
    xs = (jnp.arange(w) - cx) / s + cx
    return resample_bilinear(img, ys, xs)


def cutout(key, img, length=100, fill=0.0):
    """Zero one length×length square at a uniform centre, clipped to the
    image (Cutout parity, transformations.py:10-45). Works on normalised or
    raw images — `fill` is what the hole is set to."""
    h, w, _ = img.shape
    ky, kx = jax.random.split(key)
    y = jax.random.randint(ky, (), 0, h)
    x = jax.random.randint(kx, (), 0, w)
    rows = jnp.arange(h)
    cols = jnp.arange(w)
    row_in = (rows >= y - length // 2) & (rows < y + length // 2)
    col_in = (cols >= x - length // 2) & (cols < x + length // 2)
    hole = row_in[:, None] & col_in[None, :]
    return jnp.where(hole[..., None], fill, img)


def mean_pixel_regularization(key, img, p=0.75):
    pix = jnp.asarray(MEAN_PIXEL, dtype=img.dtype)
    replace = jax.random.bernoulli(key, p)
    return jnp.where(replace, jnp.broadcast_to(pix, img.shape), img)


def center_or_random_crop(key, img, size, random_crop=True):
    h, w, c = img.shape
    if random_crop:
        ky, kx = jax.random.split(key)
        top = jax.random.randint(ky, (), 0, h - size + 1)
        left = jax.random.randint(kx, (), 0, w - size + 1)
    else:
        top = (h - size) // 2
        left = (w - size) // 2
    return jax.lax.dynamic_slice(img, (top, left, 0), (size, size, c))


def resize_bilinear(img, size):
    return jax.image.resize(img, (size, size, img.shape[-1]), method="bilinear")
