"""timm-style batch/policy augmentations, fully on device.

Parity: the vanilla timm trainer's create_loader surface
(reference timm_train.py:238-271, 585-612):
- **Mixup / CutMix** (timm.data.Mixup, 'batch' mode): one Beta-sampled
  lambda per batch, mixed with the flipped batch, soft targets with label
  smoothing folded in;
- **RandAugment** ('rand-mN-mstdS'): timm's 15-op policy re-implemented as
  jit-able image ops (affine ops ride a gather-based bilinear sampler; the
  histogram/LUT ops use fixed 256-bin integer math matching PIL);
- **AugMix** ('augmix-mM-wW-dD'): timm's augment_and_mix_transform — per
  image, `width` op chains of 1-3 ops from the 13-op AugMix set are
  Dirichlet-mixed and Beta-blended with the original (the --aug-splits /
  --jsd-loss training protocol, timm_train.py:614-663);
- **Random Erasing** (--reprob, 'pixel'/'const' modes): per-sample noise
  rectangle after normalization.

TPU-first: everything is shape-static, vmapped per sample with split PRNG
keys, and runs inside the jitted train step — no CPU worker augmentation.
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Mixup / CutMix (timm.data.Mixup, mode='batch')
# ---------------------------------------------------------------------------


def _one_hot_smoothed(labels, num_classes, smoothing):
    off = smoothing / num_classes
    on = 1.0 - smoothing + off
    return jax.nn.one_hot(labels, num_classes) * (on - off) + off


def _cutmix_box(key, h, w, lam):
    """Random box with area ratio (1-lam) centred uniformly; returns the
    bounding coords and the corrected lambda (actual kept-area fraction)."""
    ky, kx = jax.random.split(key)
    ratio = jnp.sqrt(1.0 - lam)
    cut_h = (h * ratio).astype(jnp.int32)
    cut_w = (w * ratio).astype(jnp.int32)
    cy = jax.random.randint(ky, (), 0, h)
    cx = jax.random.randint(kx, (), 0, w)
    y0 = jnp.clip(cy - cut_h // 2, 0, h)
    y1 = jnp.clip(cy + cut_h // 2, 0, h)
    x0 = jnp.clip(cx - cut_w // 2, 0, w)
    x1 = jnp.clip(cx + cut_w // 2, 0, w)
    lam_corr = 1.0 - ((y1 - y0) * (x1 - x0)) / float(h * w)
    return y0, y1, x0, x1, lam_corr


def _cutmix_box_minmax(key, h, w, minmax):
    """timm rand_bbox_minmax: per-dim cut ratios sampled uniform(*minmax),
    box placed fully inside the image; lambda follows from the box area."""
    kh, kw, ky, kx = jax.random.split(key, 4)
    rh = jax.random.uniform(kh, (), minval=minmax[0], maxval=minmax[1])
    rw = jax.random.uniform(kw, (), minval=minmax[0], maxval=minmax[1])
    cut_h = (h * rh).astype(jnp.int32)
    cut_w = (w * rw).astype(jnp.int32)
    y0 = jax.random.randint(ky, (), 0, jnp.maximum(h - cut_h, 1))
    x0 = jax.random.randint(kx, (), 0, jnp.maximum(w - cut_w, 1))
    y1 = y0 + cut_h
    x1 = x0 + cut_w
    lam_corr = 1.0 - ((y1 - y0) * (x1 - x0)) / float(h * w)
    return y0, y1, x0, x1, lam_corr


def make_mixup_cutmix(
    num_classes: int,
    mixup_alpha: float = 0.8,
    cutmix_alpha: float = 0.0,
    prob: float = 1.0,
    switch_prob: float = 0.5,
    smoothing: float = 0.1,
    mode: str = "batch",
    cutmix_minmax=None,
) -> Callable:
    """fn(key, images, labels) -> (mixed_images, soft_targets).

    timm.data.Mixup semantics. ``mode``:
      - 'batch' (timm default): one lambda/box/choice for the whole batch;
      - 'elem': independent lambda/box/active/choice per sample;
      - 'pair': per-sample params but sample i and its partner B-1-i share
        them (timm's mutual pair mix).
    Partner = the flipped batch in every mode. Either mixup or cutmix is
    active per draw; when both alphas are > 0 the choice is
    Bernoulli(switch_prob) (timm_train.py:266). ``cutmix_minmax`` overrides
    the Beta cutmix lambda with timm's rand_bbox_minmax box sampling."""
    if mode not in ("batch", "pair", "elem"):
        raise ValueError(f"unknown mixup mode {mode!r}")
    if cutmix_minmax is not None and len(cutmix_minmax) != 2:
        raise ValueError("cutmix_minmax takes exactly two values (min, max)")
    use_mix = mixup_alpha > 0.0
    use_cut = cutmix_alpha > 0.0 or cutmix_minmax is not None
    if not (use_mix or use_cut):
        raise ValueError("enable mixup and/or cutmix (alpha > 0)")

    def _symmetrize(v, b):
        # pair mode: element i shares its params with partner b-1-i — keep
        # the first half and mirror it (odd middle element keeps its own).
        half = v[: (b + 1) // 2]
        tail = half[: b // 2][::-1]
        return jnp.concatenate([half, tail])

    def fn(key, images, labels):
        b, h, w, _ = images.shape
        n = 1 if mode == "batch" else b
        k_on, k_switch, k_lam_m, k_lam_c, k_box = jax.random.split(key, 5)
        active = jax.random.bernoulli(k_on, prob, (n,))
        if use_mix and use_cut:
            pick_cut = jax.random.bernoulli(k_switch, switch_prob, (n,))
        else:
            pick_cut = jnp.full((n,), use_cut)
        lam_mix = (
            jax.random.beta(k_lam_m, mixup_alpha, mixup_alpha, (n,))
            if use_mix else jnp.ones((n,), jnp.float32)
        )
        if cutmix_minmax is not None:
            boxes = jax.vmap(
                lambda k: _cutmix_box_minmax(k, h, w, cutmix_minmax)
            )(jax.random.split(k_box, n))
        else:
            lam_cut_raw = (
                jax.random.beta(k_lam_c, cutmix_alpha, cutmix_alpha, (n,))
                if use_cut else jnp.ones((n,), jnp.float32)
            )
            boxes = jax.vmap(lambda k, l: _cutmix_box(k, h, w, l))(
                jax.random.split(k_box, n), lam_cut_raw
            )
        y0, y1, x0, x1, lam_cut = boxes

        if mode == "pair":
            active, pick_cut, lam_mix = (
                _symmetrize(active, b),
                _symmetrize(pick_cut, b),
                _symmetrize(lam_mix, b),
            )
            y0, y1, x0, x1, lam_cut = (
                _symmetrize(v, b) for v in (y0, y1, x0, x1, lam_cut)
            )
            n_eff = b
        else:
            n_eff = n

        def bcast(v):  # (n_eff,) -> (B,1,1,1)
            v = jnp.broadcast_to(v, (b,)) if n_eff == 1 else v
            return v.reshape(b, 1, 1, 1)

        flipped = images[::-1]
        lam_mix_b = bcast(lam_mix.astype(images.dtype))
        mixed_mix = images * lam_mix_b + flipped * (1.0 - lam_mix_b)
        rows = jnp.arange(h)[None, :, None]
        cols = jnp.arange(w)[None, None, :]
        in_box = (
            (rows >= bcast(y0)[..., 0])
            & (rows < bcast(y1)[..., 0])
            & (cols >= bcast(x0)[..., 0])
            & (cols < bcast(x1)[..., 0])
        )
        mixed_cut = jnp.where(in_box[..., None], flipped, images)

        pick_cut_b = bcast(pick_cut)
        mixed = jnp.where(pick_cut_b, mixed_cut, mixed_mix)
        lam = jnp.where(pick_cut, lam_cut, lam_mix)
        active_b = bcast(active)
        out_images = jnp.where(active_b, mixed, images)
        lam = jnp.where(active, lam, 1.0)
        lam = jnp.broadcast_to(lam, (b,)) if n_eff == 1 else lam

        y = _one_hot_smoothed(labels, num_classes, smoothing)
        y_f = y[::-1]
        targets = y * lam[:, None] + y_f * (1.0 - lam[:, None])
        return out_images.astype(images.dtype), targets

    return fn


# ---------------------------------------------------------------------------
# Random Erasing (timm.data.RandomErasing, --reprob / --remode / --recount)
# ---------------------------------------------------------------------------


def make_random_erasing(
    prob: float = 0.25,
    mode: str = "pixel",
    count: int = 1,
    area_range=(0.02, 1.0 / 3.0),
    aspect_range=(0.3, 1.0 / 0.3),
) -> Callable:
    """fn(key, images) -> images with per-sample noise rectangles.

    Applied AFTER normalization (timm semantics): 'pixel' fills with
    standard-normal noise, 'const' with zeros.
    """
    log_aspect = (math.log(aspect_range[0]), math.log(aspect_range[1]))

    def erase_one(key, img):
        h, w, c = img.shape
        # timm RandomErasing semantics: ONE apply-probability roll per
        # image; when count > 1 each rectangle targets area/count.
        key, kp = jax.random.split(key)
        do_img = jax.random.bernoulli(kp, prob)

        def body(i, carry):
            img, key = carry
            key, ka, kr, ky, kx, kf = jax.random.split(key, 6)
            frac = jax.random.uniform(
                ka, (), minval=area_range[0], maxval=area_range[1]
            )
            aspect = jnp.exp(
                jax.random.uniform(
                    kr, (), minval=log_aspect[0], maxval=log_aspect[1]
                )
            )
            area = frac * h * w / count
            eh = jnp.clip(
                jnp.sqrt(area * aspect).astype(jnp.int32), 1, h
            )
            ew = jnp.clip(
                jnp.sqrt(area / aspect).astype(jnp.int32), 1, w
            )
            # timm places the box fully in-bounds (top ∈ [0, h-eh]); sampling
            # over [0, h) and clipping would under-erase the target area
            top = jnp.floor(
                jax.random.uniform(ky, ()) * (h - eh + 1).astype(jnp.float32)
            ).astype(jnp.int32)
            left = jnp.floor(
                jax.random.uniform(kx, ()) * (w - ew + 1).astype(jnp.float32)
            ).astype(jnp.int32)
            rows = jnp.arange(h)[:, None]
            cols = jnp.arange(w)[None, :]
            box = (
                (rows >= top) & (rows < top + eh)
                & (cols >= left) & (cols < left + ew)
            )
            if mode == "pixel":
                fill = jax.random.normal(kf, img.shape, img.dtype)
            else:
                fill = jnp.zeros_like(img)
            img = jnp.where(do_img & box[..., None], fill, img)
            return img, key

        img, _ = jax.lax.fori_loop(0, count, body, (img, key))
        return img

    def fn(key, images):
        keys = jax.random.split(key, images.shape[0])
        return jax.vmap(erase_one)(keys, images)

    return fn


# ---------------------------------------------------------------------------
# RandAugment ('rand-mN-mstdS', timm's 15-op default policy)
# ---------------------------------------------------------------------------

def _affine_sample(img, a, b, tx, c, d, ty):
    """Inverse-warp bilinear sample: out(y, x) = img(a*y + b*x + ty,
    c*y + d*x + tx)-ish with the affine expressed about the image centre.
    Gathers (4 taps); edge pixels clamp."""
    h, w, ch = img.shape
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    ys = jnp.arange(h, dtype=jnp.float32)[:, None] - cy
    xs = jnp.arange(w, dtype=jnp.float32)[None, :] - cx
    src_y = a * ys + b * xs + cy + ty
    src_x = c * ys + d * xs + cx + tx
    y0 = jnp.clip(jnp.floor(src_y), 0, h - 1)
    x0 = jnp.clip(jnp.floor(src_x), 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    wy = jnp.clip(src_y - y0, 0.0, 1.0)[..., None]
    wx = jnp.clip(src_x - x0, 0.0, 1.0)[..., None]
    flat = img.reshape(h * w, ch)

    def take(yy, xx):
        idx = (yy * w + xx).astype(jnp.int32)
        return flat[idx.reshape(-1)].reshape(h, w, ch)

    out = (
        take(y0, x0) * (1 - wy) * (1 - wx)
        + take(y0, x1) * (1 - wy) * wx
        + take(y1, x0) * wy * (1 - wx)
        + take(y1, x1) * wy * wx
    )
    # out-of-image taps → fill with 128 (PIL fillcolor used by timm)
    oob = (
        (src_y < -0.5) | (src_y > h - 0.5)
        | (src_x < -0.5) | (src_x > w - 0.5)
    )
    return jnp.where(oob[..., None], 128.0, out)


def _grayscale255(img):
    # PIL L-mode weights
    return (
        0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
    )[..., None]


def _blend(a, b, factor):
    return jnp.clip(b + (a - b) * factor, 0.0, 255.0)


def _op_autocontrast(img, m, sign):
    lo = img.min(axis=(0, 1), keepdims=True)
    hi = img.max(axis=(0, 1), keepdims=True)
    scale = 255.0 / jnp.maximum(hi - lo, 1e-6)
    out = (img - lo) * scale
    return jnp.where(hi > lo, out, img)


def _op_equalize(img, m, sign):
    """PIL ImageOps.equalize integer-LUT semantics per channel."""

    def eq_channel(ch):
        ints = jnp.clip(ch, 0, 255).astype(jnp.int32).reshape(-1)
        h = jnp.bincount(ints, length=256)
        nonzero = h > 0
        # count of the highest occupied bin (PIL's histo[-1])
        last_idx = 255 - jnp.argmax(nonzero[::-1])
        step = (h.sum() - h[last_idx]) // 255
        csum = jnp.concatenate([jnp.zeros((1,), h.dtype), jnp.cumsum(h)[:-1]])
        lut = jnp.clip((step // 2 + csum) // jnp.maximum(step, 1), 0, 255)
        out = lut[ints].reshape(ch.shape).astype(ch.dtype)
        return jnp.where(step > 0, out, ch)

    return jnp.stack(
        [eq_channel(img[..., c]) for c in range(img.shape[-1])], axis=-1
    )


def _op_invert(img, m, sign):
    return 255.0 - img


def _op_rotate(img, m, sign):
    deg = sign * m / 10.0 * 30.0
    th = jnp.deg2rad(deg)
    cos, sin = jnp.cos(th), jnp.sin(th)
    return _affine_sample(img, cos, -sin, 0.0, sin, cos, 0.0)


def _op_posterize(img, m, sign):
    # timm PosterizeIncreasing: kept bits = 4 - int(m/10 * 4) — m=9 keeps a
    # single MSB (near-binary), m=0 keeps 4. Clamped to >=1 where PIL would
    # raise on 0 kept bits (m=10).
    keep = jnp.clip(4 - jnp.floor(m / 10.0 * 4.0).astype(jnp.int32), 1, 8)
    q = (2.0 ** (8 - keep)).astype(jnp.float32)
    return jnp.floor(jnp.clip(img, 0, 255) / q) * q


def _op_solarize(img, m, sign):
    thr = 256.0 - m / 10.0 * 256.0
    return jnp.where(img >= thr, 255.0 - img, img)


def _op_solarize_add(img, m, sign):
    add = m / 10.0 * 110.0
    return jnp.where(img < 128.0, jnp.clip(img + add, 0, 255), img)


def _enhance_factor(m, sign):
    return 1.0 + sign * m / 10.0 * 0.9


def _op_color(img, m, sign):
    return _blend(img, jnp.broadcast_to(_grayscale255(img), img.shape),
                  _enhance_factor(m, sign))


def _op_contrast(img, m, sign):
    mean = _grayscale255(img).mean()
    return _blend(img, jnp.broadcast_to(mean, img.shape),
                  _enhance_factor(m, sign))


def _op_brightness(img, m, sign):
    return _blend(img, jnp.zeros_like(img), _enhance_factor(m, sign))


def _op_sharpness(img, m, sign):
    # PIL SMOOTH kernel [[1,1,1],[1,5,1],[1,1,1]]/13 as 9 shifted adds
    # (elementwise sums instead of a tiny-contraction conv — see the
    # verify-skill note on pathological matvec compiles).
    h, w = img.shape[0], img.shape[1]
    pad = jnp.pad(img, ((1, 1), (1, 1), (0, 0)), mode="edge")
    acc = jnp.zeros_like(img)
    for dy in range(3):
        for dx in range(3):
            wgt = 5.0 if (dy == 1 and dx == 1) else 1.0
            acc = acc + wgt * pad[dy : dy + h, dx : dx + w]
    return _blend(img, acc / 13.0, _enhance_factor(m, sign))


def _op_shear_x(img, m, sign):
    s = sign * m / 10.0 * 0.3
    return _affine_sample(img, 1.0, 0.0, 0.0, s, 1.0, 0.0)


def _op_shear_y(img, m, sign):
    s = sign * m / 10.0 * 0.3
    return _affine_sample(img, 1.0, s, 0.0, 0.0, 1.0, 0.0)


def _op_translate_x(img, m, sign):
    t = sign * m / 10.0 * 0.45 * img.shape[1]
    return _affine_sample(img, 1.0, 0.0, t, 0.0, 1.0, 0.0)


def _op_translate_y(img, m, sign):
    t = sign * m / 10.0 * 0.45 * img.shape[0]
    return _affine_sample(img, 1.0, 0.0, 0.0, 0.0, 1.0, t)


_RA_OPS = [
    _op_autocontrast,
    _op_equalize,
    _op_invert,
    _op_rotate,
    _op_posterize,
    _op_solarize,
    _op_solarize_add,
    _op_color,
    _op_contrast,
    _op_brightness,
    _op_sharpness,
    _op_shear_x,
    _op_shear_y,
    _op_translate_x,
    _op_translate_y,
]


def parse_rand_augment(spec: str):
    """'rand-m9-mstd0.5[-n2]' → (magnitude, mstd, num_ops). timm syntax
    subset (timm_train.py:238 --aa)."""
    if not spec.startswith("rand"):
        raise ValueError(f"unsupported auto-augment spec {spec!r} "
                         "(only RandAugment 'rand-...' is implemented)")
    m, mstd, n = 9.0, 0.0, 2
    for part in spec.split("-")[1:]:
        if part.startswith("mstd"):
            mstd = float(part[4:])
        elif part.startswith("m"):
            m = float(part[1:])
        elif part.startswith("n"):
            n = int(part[1:])
    return m, mstd, n


def make_rand_augment(
    spec: str = "rand-m9-mstd0.5", apply_prob: float = 0.5
) -> Callable:
    """fn(key, uint8_images) -> uint8_images with the RandAugment policy:
    per sample, num_ops ops chosen uniformly (with replacement) from the
    15-op set, each applied with probability ``apply_prob`` (timm default
    0.5) at magnitude ~ N(m, mstd) clipped to [0, 10], random sign for the
    signed ops."""
    magnitude, mstd, num_ops = parse_rand_augment(spec)

    def apply_one(key, img):
        imgf = img.astype(jnp.float32)

        def body(i, carry):
            imgf, key = carry
            key, kop, km, ks, kp = jax.random.split(key, 5)
            op_idx = jax.random.randint(kop, (), 0, len(_RA_OPS))
            m = magnitude
            if mstd > 0:
                m = jnp.clip(
                    magnitude + mstd * jax.random.normal(km), 0.0, 10.0
                )
            sign = jnp.where(jax.random.bernoulli(ks), 1.0, -1.0)
            out = jax.lax.switch(op_idx, _RA_OPS, imgf, m, sign)
            do = jax.random.bernoulli(kp, apply_prob)
            return jnp.where(do, out, imgf), key

        imgf, _ = jax.lax.fori_loop(0, num_ops, body, (imgf, key))
        return jnp.clip(imgf, 0, 255).astype(img.dtype)

    def fn(key, images):
        keys = jax.random.split(key, images.shape[0])
        return jax.vmap(apply_one)(keys, images)

    return fn


# ---------------------------------------------------------------------------
# AugMix ('augmix-mM-wW-dD[-aA][-mstdS]', timm augment_and_mix_transform)
# ---------------------------------------------------------------------------

# timm's _AUGMIX_TRANSFORMS (the Hendrycks et al. AugMix op set): the
# "Increasing" enhance/posterize/solarize semantics are what _op_* already
# implement for RandAugment; Invert/SolarizeAdd are RandAugment-only.
_AUGMIX_OPS = [
    _op_autocontrast,
    _op_color,
    _op_contrast,
    _op_brightness,
    _op_sharpness,
    _op_equalize,
    _op_rotate,
    _op_posterize,
    _op_solarize,
    _op_shear_x,
    _op_shear_y,
    _op_translate_x,
    _op_translate_y,
]


def parse_augmix(spec: str):
    """'augmix[-mM-wW-dD-aA-mstdS]' → (magnitude, width, depth, alpha,
    mstd). timm defaults: m=3, w=3, d=-1 (random 1-3 per chain), a=1,
    magnitude_std=inf (magnitude ~ U[0, m] per op). Blended mode ('-b...')
    is timm's non-default approximation and is not implemented."""
    if not spec.startswith("augmix"):
        raise ValueError(f"not an AugMix spec: {spec!r}")
    m, w, d, a, mstd = 3.0, 3, -1, 1.0, float("inf")
    for part in spec.split("-")[1:]:
        if part.startswith("mstd"):
            mstd = float(part[4:])
        elif part.startswith("m"):
            m = float(part[1:])
        elif part.startswith("w"):
            w = int(part[1:])
        elif part.startswith("d"):
            d = int(part[1:])
        elif part.startswith("a"):
            a = float(part[1:])
        elif part.startswith("b"):
            raise ValueError(
                "blended AugMix ('-b') is a non-default timm approximation; "
                "use the exact mix (no '-b' in the spec)"
            )
    return m, w, d, a, mstd


def make_augmix(spec: str = "augmix-m3-w3") -> Callable:
    """fn(key, uint8_images) -> uint8_images with the AugMix policy
    (arXiv:1912.02781 via timm): per image, `width` chains of `depth`
    (or random 1-3) ops from the 13-op set — each at magnitude ~ U[0, m]
    (or N(m, mstd)) with random sign for the signed ops — are mixed with
    Dirichlet(alpha) weights, then blended with the original image by
    m ~ Beta(alpha, alpha)."""
    magnitude, width, depth, alpha, mstd = parse_augmix(spec)
    max_depth = depth if depth > 0 else 3

    def chain(key, imgf):
        kd, key = jax.random.split(key)
        d = (
            jnp.asarray(depth, jnp.int32)
            if depth > 0
            else jax.random.randint(kd, (), 1, 4)
        )

        def body(i, carry):
            out, key = carry
            key, kop, km, ks = jax.random.split(key, 4)
            op_idx = jax.random.randint(kop, (), 0, len(_AUGMIX_OPS))
            if math.isinf(mstd):
                m = jax.random.uniform(km, (), minval=0.0, maxval=magnitude)
            elif mstd > 0:
                m = jnp.clip(magnitude + mstd * jax.random.normal(km), 0.0, 10.0)
            else:
                m = jnp.asarray(magnitude, jnp.float32)
            sign = jnp.where(jax.random.bernoulli(ks), 1.0, -1.0)
            stepped = jax.lax.switch(op_idx, _AUGMIX_OPS, out, m, sign)
            return jnp.where(i < d, stepped, out), key

        out, _ = jax.lax.fori_loop(0, max_depth, body, (imgf, key))
        return out

    def apply_one(key, img):
        imgf = img.astype(jnp.float32)
        kw, kb, kc = jax.random.split(key, 3)
        weights = jax.random.dirichlet(kw, jnp.full((width,), alpha))
        blend_m = jax.random.beta(kb, alpha, alpha)
        mixed = jnp.zeros_like(imgf)
        for i in range(width):
            mixed = mixed + weights[i] * chain(jax.random.fold_in(kc, i), imgf)
        # timm truncates the mix to uint8 before PIL Image.blend
        mixed = jnp.floor(jnp.clip(mixed, 0.0, 255.0))
        out = imgf + blend_m * (mixed - imgf)
        return jnp.clip(jnp.round(out), 0, 255).astype(img.dtype)

    def fn(key, images):
        keys = jax.random.split(key, images.shape[0])
        return jax.vmap(apply_one)(keys, images)

    return fn


def make_auto_augment(spec: str, apply_prob: float = 0.5) -> Callable:
    """Dispatch a timm --aa spec to the matching on-device policy:
    'rand-...' → RandAugment, 'augmix...' → AugMix (the only families a
    GipMed-adjacent recipe can reach; 'original'/'v0' AutoAugment policies
    raise with that pointer)."""
    if spec.startswith("augmix"):
        return make_augmix(spec)
    return make_rand_augment(spec, apply_prob=apply_prob)
