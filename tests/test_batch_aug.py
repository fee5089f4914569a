"""timm batch-augmentation parity tests (timm_train.py:238-271, 585-612).

Golden checks: the pointwise/LUT RandAugment ops match PIL.ImageOps exactly
on uint8 inputs; mixup/cutmix produce convex soft targets; random erasing
fills boxes; everything jits.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image, ImageOps

from tpuwsi.preprocess.batch_aug import (
    _op_autocontrast,
    _op_equalize,
    _op_invert,
    _op_posterize,
    _op_solarize,
    make_mixup_cutmix,
    make_rand_augment,
    make_random_erasing,
    parse_rand_augment,
)


def _rand_img(seed=0, size=32):
    return np.random.default_rng(seed).integers(
        0, 256, (size, size, 3), dtype=np.uint8
    )


def test_equalize_matches_pil():
    img = _rand_img(1)
    ours = np.asarray(
        _op_equalize(jnp.asarray(img, jnp.float32), 0.0, 1.0)
    ).astype(np.uint8)
    ref = np.asarray(ImageOps.equalize(Image.fromarray(img)))
    np.testing.assert_array_equal(ours, ref)


def test_invert_solarize_posterize_autocontrast_match_pil():
    img = _rand_img(2)
    f = jnp.asarray(img, jnp.float32)

    np.testing.assert_array_equal(
        np.asarray(_op_invert(f, 0, 1.0)).astype(np.uint8),
        np.asarray(ImageOps.invert(Image.fromarray(img))),
    )
    # solarize at m=5 → threshold 128
    np.testing.assert_array_equal(
        np.asarray(_op_solarize(f, 5.0, 1.0)).astype(np.uint8),
        np.asarray(ImageOps.solarize(Image.fromarray(img), threshold=128)),
    )
    # PosterizeIncreasing (timm auto_augment.py): kept bits = 4 - int(m/10*4)
    # m=0 → 4 bits, m=5 → 2 bits, m=9 → 1 bit (near-binary)
    for m, bits in ((0.0, 4), (5.0, 2), (9.0, 1)):
        np.testing.assert_array_equal(
            np.asarray(_op_posterize(f, m, 1.0)).astype(np.uint8),
            np.asarray(ImageOps.posterize(Image.fromarray(img), bits=bits)),
            err_msg=f"posterize m={m}",
        )
    # autocontrast: PIL uses per-channel min/max with no clipping cutoff
    ours = np.asarray(_op_autocontrast(f, 0, 1.0))
    ref = np.asarray(ImageOps.autocontrast(Image.fromarray(img)))
    assert np.abs(ours - ref.astype(np.float32)).max() <= 1.0


def test_parse_rand_augment():
    assert parse_rand_augment("rand-m9-mstd0.5") == (9.0, 0.5, 2)
    assert parse_rand_augment("rand-m7-mstd0.5-n3") == (7.0, 0.5, 3)
    with pytest.raises(ValueError):
        parse_rand_augment("original-mstd0.5")


def test_rand_augment_jits_and_preserves_shape():
    imgs = np.stack([_rand_img(i) for i in range(4)])
    ra = jax.jit(make_rand_augment("rand-m9-mstd0.5"))
    out = np.asarray(ra(jax.random.PRNGKey(0), jnp.asarray(imgs)))
    assert out.shape == imgs.shape and out.dtype == np.uint8
    # with apply_prob 0.5 over 2 ops, at least one sample must change
    assert (out != imgs).any()


def test_mixup_soft_targets_convex():
    fn = make_mixup_cutmix(num_classes=4, mixup_alpha=0.8, cutmix_alpha=0.0,
                           smoothing=0.1)
    imgs = jnp.asarray(np.random.rand(6, 16, 16, 3), jnp.float32)
    labels = jnp.asarray([0, 1, 2, 3, 0, 1])
    out, targets = jax.jit(fn)(jax.random.PRNGKey(0), imgs, labels)
    assert out.shape == imgs.shape
    np.testing.assert_allclose(np.asarray(targets).sum(-1), 1.0, atol=1e-5)
    # mixture of self and flipped one-hots only: at most 2 strong entries
    assert ((np.asarray(targets) > 0.2).sum(-1) <= 2).all()


def test_cutmix_box_and_lambda():
    fn = make_mixup_cutmix(num_classes=2, mixup_alpha=0.0, cutmix_alpha=1.0,
                           smoothing=0.0)
    imgs = jnp.concatenate(
        [jnp.zeros((1, 32, 32, 3)), jnp.ones((1, 32, 32, 3))]
    ).astype(jnp.float32)
    labels = jnp.asarray([0, 1])
    out, targets = jax.jit(fn)(jax.random.PRNGKey(3), imgs, labels)
    out = np.asarray(out)
    # sample 0 is zeros with a pasted box of ones → mean equals 1 - lambda
    frac = out[0].mean()
    lam = float(np.asarray(targets)[0, 0])
    np.testing.assert_allclose(frac, 1.0 - lam, atol=1e-5)


def test_random_erasing_fills_boxes():
    fn = make_random_erasing(prob=1.0, mode="const")
    imgs = jnp.ones((4, 24, 24, 3), jnp.float32)
    out = np.asarray(jax.jit(fn)(jax.random.PRNGKey(0), imgs))
    assert (out == 0).any(axis=(1, 2, 3)).all(), "every sample gets a box"
    fn_off = make_random_erasing(prob=0.0)
    out2 = np.asarray(jax.jit(fn_off)(jax.random.PRNGKey(0), imgs))
    np.testing.assert_array_equal(out2, np.ones_like(out2))


def test_mixup_in_train_step_learns():
    """mix_fn wiring: soft-target loss path still trains."""
    import dataclasses

    import optax

    from tpuwsi.models.vit import VisionTransformer, vit_tiny
    from tpuwsi.train import create_train_state, make_train_step

    cfg = dataclasses.replace(
        vit_tiny(num_classes=2, img_size=16, use_pallas_attention=False,
                 dtype=jnp.float32),
        depth=1, embed_dim=32, num_heads=2,
    )
    model = VisionTransformer(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    tx = optax.adam(1e-3)
    state = create_train_state(params, tx)
    mix = make_mixup_cutmix(2, mixup_alpha=0.2, cutmix_alpha=1.0,
                            smoothing=0.1)
    step = jax.jit(make_train_step(
        model.apply, tx,
        augment_fn=lambda k, im: im.astype(jnp.float32) / 255.0,
        mix_fn=mix,
    ))
    imgs = np.zeros((8, 16, 16, 3), np.uint8)
    imgs[4:] = 220
    batch = {"images": jnp.asarray(imgs),
             "labels": jnp.asarray([0] * 4 + [1] * 4)}
    losses = []
    for i in range(25):
        state, m = step(state, batch, jax.random.PRNGKey(1))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]


# ---- timm folder transform stack (preprocess/timm_aug.py) --------------------


def test_timm_train_aug_shapes_and_normalization():
    from tpuwsi.preprocess.timm_aug import make_timm_train_aug

    aug = make_timm_train_aug(32, scale=(0.9, 1.0), color_jitter=None)
    imgs = np.random.default_rng(0).integers(
        0, 255, (4, 48, 48, 3), dtype=np.uint8
    )
    jit_aug = jax.jit(aug)
    out = np.asarray(jit_aug(jax.random.PRNGKey(0), jnp.asarray(imgs)))
    assert out.shape == (4, 32, 32, 3)
    assert out.dtype == np.float32
    # ImageNet normalization: uint8 mid-grey ≈ (0.5-mean)/std, bounded
    assert -3.0 < out.mean() < 3.0
    # deterministic under the same key
    out2 = np.asarray(jit_aug(jax.random.PRNGKey(0), jnp.asarray(imgs)))
    np.testing.assert_allclose(out, out2, rtol=1e-6)


def test_timm_train_aug_mean_std_override_and_hflip():
    from tpuwsi.preprocess.timm_aug import make_timm_train_aug

    # identity crop (scale=1, ratio=1), no jitter, mean 0 / std 1 → raw
    # [0,1] pixels; hflip=1.0 must mirror every image
    base = make_timm_train_aug(
        16, scale=(1.0, 1.0), ratio=(1.0, 1.0), hflip=0.0,
        color_jitter=None, mean=(0, 0, 0), std=(1, 1, 1),
    )
    flip = make_timm_train_aug(
        16, scale=(1.0, 1.0), ratio=(1.0, 1.0), hflip=1.0,
        color_jitter=None, mean=(0, 0, 0), std=(1, 1, 1),
    )
    imgs = np.random.default_rng(1).integers(
        0, 255, (2, 16, 16, 3), dtype=np.uint8
    )
    a = np.asarray(base(jax.random.PRNGKey(3), jnp.asarray(imgs)))
    b = np.asarray(flip(jax.random.PRNGKey(3), jnp.asarray(imgs)))
    assert a.min() >= 0.0 and a.max() <= 1.0
    np.testing.assert_allclose(a[:, :, ::-1], b, atol=1e-5)


def test_timm_eval_center_crop():
    from tpuwsi.preprocess.timm_aug import make_timm_eval

    ev = make_timm_eval(16, crop_pct=0.5, mean=(0, 0, 0), std=(1, 1, 1))
    # 32x32 source, resize target = 16/0.5 = 32 (identity), center crop 16
    img = np.zeros((1, 32, 32, 3), np.uint8)
    img[0, 8:24, 8:24] = 255
    out = np.asarray(ev(None, jnp.asarray(img)))
    assert out.shape == (1, 16, 16, 3)
    assert out.mean() > 0.95  # the crop landed exactly on the bright center


def test_clip_modes_produce_finite_updates():
    import optax

    from tpuwsi.train.optim import OptimConfig, make_optimizer

    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    grads = {"w": jnp.full((4, 4), 10.0), "b": jnp.full((4,), 10.0)}
    for mode in ("norm", "value", "agc"):
        cfg = OptimConfig(opt="sgd", lr=0.1, clip_grad=0.5, clip_mode=mode,
                          epochs=1, warmup_epochs=0, steps_per_epoch=10)
        tx, _ = make_optimizer(cfg, params, global_batch_size=8)
        st = tx.init(params)
        upd, _ = tx.update(grads, st, params)
        flat = jnp.concatenate([u.ravel() for u in jax.tree_util.tree_leaves(upd)])
        assert bool(jnp.isfinite(flat).all()), mode
    with np.testing.assert_raises(ValueError):
        cfg = OptimConfig(opt="sgd", lr=0.1, clip_grad=0.5, clip_mode="bogus",
                          epochs=1, warmup_epochs=0, steps_per_epoch=10)
        make_optimizer(cfg, params, global_batch_size=8)


def test_cooldown_epochs_hold_min_lr():
    from tpuwsi.train.optim import OptimConfig, make_schedule

    cfg = OptimConfig(lr=1.0, sched="cosine", epochs=10, warmup_epochs=0,
                      min_lr=0.01, cooldown_epochs=3, steps_per_epoch=10)
    sched = make_schedule(cfg, peak_lr=1.0)
    # decay finishes at epoch 7; epochs 7-9 hold min_lr
    assert abs(float(sched(70)) - 0.01) < 1e-6
    assert abs(float(sched(95)) - 0.01) < 1e-6
    assert float(sched(35)) > 0.1


def test_start_epoch_schedule_offset():
    """timm --start-epoch advances the scheduler (lr_scheduler.step(N)); a
    fresh run with an offset must NOT replay warmup (review finding r3)."""
    from tpuwsi.train.optim import OptimConfig, make_schedule

    cfg = OptimConfig(lr=1.0, sched="cosine", epochs=10, warmup_epochs=2,
                      min_lr=0.0, steps_per_epoch=10)
    off = OptimConfig(lr=1.0, sched="cosine", epochs=10, warmup_epochs=2,
                      min_lr=0.0, steps_per_epoch=10,
                      schedule_offset_steps=50)
    base, shifted = make_schedule(cfg, 1.0), make_schedule(off, 1.0)
    # shifted(0) == base(50): mid-decay, far from the warmup_lr start
    assert abs(float(shifted(0)) - float(base(50))) < 1e-6
    assert float(shifted(0)) > 0.5  # not replaying warmup_lr=1e-5
    # end of the shifted run == end of the base run
    assert abs(float(shifted(49)) - float(base(99))) < 1e-6


def test_cooldown_holds_final_step_lr():
    """Cooldown must hold the schedule's FINAL value (timm: extra epochs at
    wherever the schedule landed) — forcing min_lr (previous behavior)
    silently trained the cooldown at lr=0 under the 0.0 default (review
    finding r3-s3)."""
    from tpuwsi.train.optim import OptimConfig, make_schedule

    cfg = OptimConfig(lr=1.0, sched="step", epochs=10, warmup_epochs=0,
                      decay_epochs=2, decay_rate=0.5, min_lr=0.0,
                      cooldown_epochs=4, steps_per_epoch=10)
    sched = make_schedule(cfg, 1.0)
    # decay window ends at epoch 6 (step 60): 0.5^3 = 0.125 held after
    assert abs(float(sched(65)) - 0.125) < 1e-9
    assert abs(float(sched(99)) - 0.125) < 1e-9
    assert float(sched(55)) > 0.125 + 1e-9  # still decaying pre-cooldown


def test_mixup_elem_mode_per_sample_lambdas():
    """elem mode: each sample draws its own lambda — with alpha-only mixup
    and smoothing 0 the per-sample target weight on the own label should
    vary across the batch (batch mode would make them all equal)."""
    fn = make_mixup_cutmix(num_classes=8, mixup_alpha=0.4, cutmix_alpha=0.0,
                           smoothing=0.0, mode="elem")
    b = 8
    imgs = jnp.asarray(np.random.rand(b, 16, 16, 3), jnp.float32)
    labels = jnp.arange(b) % 8
    out, targets = jax.jit(fn)(jax.random.PRNGKey(0), imgs, labels)
    assert out.shape == imgs.shape
    np.testing.assert_allclose(np.asarray(targets).sum(-1), 1.0, atol=1e-5)
    own = np.asarray(targets)[np.arange(b), np.asarray(labels)]
    assert np.unique(np.round(own, 6)).size > 2  # per-sample lambdas differ


def test_mixup_pair_mode_mutual():
    """pair mode: sample i and its partner B-1-i share one lambda — the mix
    is mutual (timm _mix_pair), so own-label weights are symmetric."""
    fn = make_mixup_cutmix(num_classes=8, mixup_alpha=0.4, cutmix_alpha=0.0,
                           smoothing=0.0, mode="pair", prob=1.0)
    b = 6
    imgs = jnp.asarray(np.random.rand(b, 16, 16, 3), jnp.float32)
    labels = jnp.arange(b)
    _, targets = jax.jit(fn)(jax.random.PRNGKey(1), imgs, labels)
    t = np.asarray(targets)
    own = t[np.arange(b), np.arange(b)]
    np.testing.assert_allclose(own, own[::-1], atol=1e-6)
    # cross weight of i on partner's label = 1 - lam, also symmetric
    cross = t[np.arange(b), b - 1 - np.arange(b)]
    np.testing.assert_allclose(cross, cross[::-1], atol=1e-6)


def test_cutmix_minmax_bounds_box_area():
    """--cutmix-minmax: the pasted box area fraction must lie inside
    [min^2, max^2] (per-dim ratios each within [min, max])."""
    mn, mx = 0.3, 0.6
    fn = make_mixup_cutmix(num_classes=2, mixup_alpha=0.0, cutmix_alpha=0.0,
                           smoothing=0.0, cutmix_minmax=(mn, mx),
                           mode="elem", prob=1.0)
    b = 16
    imgs = jnp.concatenate(
        [jnp.zeros((b // 2, 64, 64, 3)), jnp.ones((b // 2, 64, 64, 3))]
    ).astype(jnp.float32)
    labels = jnp.asarray([0] * (b // 2) + [1] * (b // 2))
    for seed in range(3):
        _, targets = jax.jit(fn)(jax.random.PRNGKey(seed), imgs, labels)
        lam = np.asarray(targets)[np.arange(b), np.asarray(labels)]
        area = 1.0 - lam
        # int truncation can undershoot slightly; bound with a pixel slack
        assert (area <= mx * mx + 0.05).all(), area
        assert (area >= mn * mn - 0.05).all(), area


def test_bce_target_thresh():
    from tpuwsi.train.losses import binary_cross_entropy

    logits = jnp.asarray([[3.0, -3.0], [-3.0, 3.0]])
    labels = jnp.asarray([0, 1])
    # smoothing 0.4 → targets {0.8, 0.2}; thresh 0.5 re-binarizes to {1, 0}
    smoothed = binary_cross_entropy(logits, labels, smoothing=0.4)
    rebinned = binary_cross_entropy(logits, labels, smoothing=0.4,
                                    target_thresh=0.5)
    plain = binary_cross_entropy(logits, labels, smoothing=0.0)
    np.testing.assert_allclose(float(rebinned), float(plain), rtol=1e-6)
    assert abs(float(smoothed) - float(plain)) > 1e-3


def test_bicubic_matrix_partition_of_unity():
    from tpuwsi.preprocess.augment import interp_matrix_cubic

    coords = jnp.linspace(0.0, 30.0, 17)
    m = interp_matrix_cubic(coords, 31)
    np.testing.assert_allclose(np.asarray(m).sum(-1), 1.0, atol=1e-5)


def test_bicubic_matches_pil():
    """Our matrix bicubic (Keys a=-0.5) must match PIL BICUBIC on an
    UPSCALE (no antialias support-scaling there), away from the border
    (edge handling: replicate vs PIL's filter renormalization). torch's
    interpolate uses a=-0.75, a different kernel — PIL is the timm/
    torchvision parity target."""
    from PIL import Image

    from tpuwsi.preprocess.augment import resample

    rng = np.random.default_rng(0)
    img = rng.random((32, 32)).astype(np.float32)
    out = 48
    n = np.arange(out)
    ys = jnp.asarray((n + 0.5) * 32 / out - 0.5)
    ours = np.asarray(
        resample(jnp.asarray(img)[..., None], ys, ys, method="bicubic")
    )[..., 0]
    theirs = np.asarray(
        Image.fromarray(img, mode="F").resize((out, out), Image.BICUBIC)
    )
    np.testing.assert_allclose(ours[4:-4, 4:-4], theirs[4:-4, 4:-4],
                               atol=2e-5)


def test_random_interpolation_mixes_kernels():
    """interpolation='random' picks bicubic for ~half the images — with a
    fixed crop the two kernels give different pixels, so across many keys
    both outcomes must appear."""
    from tpuwsi.preprocess.multicrop import random_resized_crop

    img = jnp.asarray(
        np.random.default_rng(1).random((40, 40, 3)), jnp.float32
    )

    def crop(key, interp_key):
        return random_resized_crop(
            key, img, 24, (0.9, 0.9), (1.0, 1.0),
            method="bilinear", interp_key=interp_key,
        )

    base_key = jax.random.PRNGKey(0)
    lin = random_resized_crop(base_key, img, 24, (0.9, 0.9), (1.0, 1.0))
    cub = random_resized_crop(base_key, img, 24, (0.9, 0.9), (1.0, 1.0),
                              method="bicubic")
    assert not np.allclose(np.asarray(lin), np.asarray(cub))
    seen = set()
    for s in range(8):
        got = crop(base_key, jax.random.PRNGKey(s))
        if np.allclose(np.asarray(got), np.asarray(lin)):
            seen.add("bilinear")
        elif np.allclose(np.asarray(got), np.asarray(cub)):
            seen.add("bicubic")
    assert seen == {"bilinear", "bicubic"}


# ---------------------------------------------------------------------------
# AugMix (timm augment_and_mix_transform, the --aug-splits/--jsd-loss
# protocol, timm_train.py:614-663)
# ---------------------------------------------------------------------------


def test_parse_augmix_defaults_and_overrides():
    from tpuwsi.preprocess.batch_aug import parse_augmix

    assert parse_augmix("augmix") == (3.0, 3, -1, 1.0, float("inf"))
    assert parse_augmix("augmix-m5-w4-d2-a0.7-mstd0.5") == (5.0, 4, 2, 0.7, 0.5)
    with pytest.raises(ValueError):
        parse_augmix("augmix-b1")  # blended mode: explicit non-goal
    with pytest.raises(ValueError):
        parse_augmix("rand-m9")


def test_augmix_op_set_matches_timm():
    """timm _AUGMIX_TRANSFORMS is a 13-op subset of the RandAugment set
    (no Invert/SolarizeAdd); the mix must draw from exactly those."""
    from tpuwsi.preprocess.batch_aug import (
        _AUGMIX_OPS, _RA_OPS, _op_invert, _op_solarize_add,
    )

    assert len(_AUGMIX_OPS) == 13
    assert set(_AUGMIX_OPS) <= set(_RA_OPS)
    assert _op_invert not in _AUGMIX_OPS
    assert _op_solarize_add not in _AUGMIX_OPS


def test_augmix_deterministic_and_varies():
    from tpuwsi.preprocess.batch_aug import make_augmix

    fn = jax.jit(make_augmix("augmix-m3-w3"))
    imgs = jnp.asarray(np.stack([_rand_img(s) for s in range(4)]))
    k = jax.random.PRNGKey(0)
    a, b = fn(k, imgs), fn(k, imgs)
    c = fn(jax.random.PRNGKey(1), imgs)
    assert a.dtype == jnp.uint8 and a.shape == imgs.shape
    assert np.array_equal(np.asarray(a), np.asarray(b))
    assert not np.array_equal(np.asarray(a), np.asarray(c))
    assert not np.array_equal(np.asarray(a), np.asarray(imgs))
    # per-sample keys: different images get different chains/weights
    same = jnp.asarray(np.stack([_rand_img(7)] * 4))
    out = np.asarray(fn(k, same))
    assert not np.array_equal(out[0], out[1])


def test_augmix_blend_stays_near_original_at_high_alpha():
    """out = img + m*(mixed - img): with alpha large, Beta(a, a)
    concentrates at 1/2 and the Dirichlet at uniform weights, so the
    output is a genuine half-blend — changed from the original, but with a
    far smaller mean|Δ| than the full op mix (m=1) would give."""
    from tpuwsi.preprocess.batch_aug import make_augmix

    img = _rand_img(5)[None]
    half = jax.jit(make_augmix("augmix-m9-w3-d2-a1000-mstd0"))
    out = np.asarray(half(jax.random.PRNGKey(3), jnp.asarray(img)))
    assert not np.array_equal(out, img)
    delta = np.abs(out.astype(np.float32) - img.astype(np.float32)).mean()
    assert 0.5 < delta < 80.0  # a collapsed blend (m≈0) would be ~0


def test_jsd_cross_entropy_matches_torch_formula():
    """Golden vs a literal torch replica of timm's JsdCrossEntropy
    (smoothed CE on split 0 + alpha * mean batchmean-KL(p_i || mean p))."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    from tpuwsi.train.losses import jsd_cross_entropy

    rng = np.random.default_rng(0)
    logits = rng.normal(size=(12, 5)).astype(np.float32)  # 3 splits x B=4
    labels = rng.integers(0, 5, size=4)
    ours = float(jsd_cross_entropy(jnp.asarray(logits), jnp.asarray(labels),
                                   num_splits=3, smoothing=0.1))
    lt, yt = torch.tensor(logits), torch.tensor(labels)
    split = torch.split(lt, 4)
    ce = F.cross_entropy(split[0], yt, label_smoothing=0.1)
    probs = [F.softmax(l, dim=1) for l in split]
    logp_mix = torch.clamp(torch.stack(probs).mean(0), 1e-7, 1).log()
    kl = sum(F.kl_div(logp_mix, p, reduction="batchmean") for p in probs) / 3
    assert abs(ours - float(ce + 12.0 * kl)) < 1e-4


def test_jsd_identical_splits_reduce_to_ce():
    from tpuwsi.train.losses import cross_entropy, jsd_cross_entropy

    rng = np.random.default_rng(1)
    one = rng.normal(size=(4, 3)).astype(np.float32)
    logits = jnp.asarray(np.concatenate([one, one, one]))
    labels = jnp.asarray(rng.integers(0, 3, size=4))
    assert float(jsd_cross_entropy(logits, labels, num_splits=3)) == pytest.approx(
        float(cross_entropy(jnp.asarray(one), labels)), abs=1e-5
    )


# ---------------------------------------------------------------------------
# create_scheduler_v2 extras (train.py:883-887): SGDR cycles, k-decay,
# warmup-prefix, LR noise, multistep, plateau
# ---------------------------------------------------------------------------


def test_cosine_cycles_k_decay_match_timm_formula():
    """timm CosineLRScheduler with cycles/k-decay/warmup-prefix: the traced
    schedule must match a literal numpy replica of timm's _get_lr."""
    import math

    from tpuwsi.train.optim import OptimConfig, make_schedule

    cfg = OptimConfig(
        lr=1.0, sched="cosine", epochs=12, warmup_epochs=2, warmup_lr=0.01,
        min_lr=0.05, steps_per_epoch=10, lr_cycle_mul=2.0,
        lr_cycle_decay=0.7, lr_cycle_limit=3, lr_k_decay=1.5,
        warmup_prefix=True,
    )
    sched = make_schedule(cfg, peak_lr=1.0)
    warm_t, span = 20, 100.0  # decay span excludes warmup (prefix)

    def timm_lr(t):
        if t < warm_t:
            return 0.01 + (1.0 - 0.01) * t / warm_t
        t = t - warm_t
        i = math.floor(math.log(1 - t / span * (1 - 2.0), 2.0))
        t_i = 2.0 ** i * span
        t_curr = t - (1 - 2.0 ** i) / (1 - 2.0) * span
        if i >= 3:
            return 0.05
        lr_max = 1.0 * 0.7 ** i
        return 0.05 + 0.5 * (lr_max - 0.05) * (
            1 + math.cos(math.pi * t_curr ** 1.5 / t_i ** 1.5)
        )

    for t in [0, 5, 19, 20, 21, 60, 119, 120, 200, 350, 700]:
        assert float(sched(t)) == pytest.approx(timm_lr(t), abs=1e-5), t


def test_cosine_restart_jumps_back_up():
    from tpuwsi.train.optim import OptimConfig, make_schedule

    cfg = OptimConfig(lr=1.0, sched="cosine", epochs=4, warmup_epochs=0,
                      min_lr=0.0, steps_per_epoch=10, lr_cycle_limit=2,
                      lr_cycle_decay=0.5)
    sched = make_schedule(cfg, 1.0)
    # cycle 0 spans steps 0-40, cycle 1 restarts at 0.5 peak
    assert float(sched(39)) < 0.05
    assert float(sched(41)) == pytest.approx(0.5, abs=0.05)
    # past cycle_limit: held at min_lr
    assert float(sched(85)) == pytest.approx(0.0, abs=1e-6)


def test_lr_noise_bounded_ranged_deterministic():
    from tpuwsi.train.optim import OptimConfig, make_schedule

    kw = dict(lr=1.0, sched="constant", epochs=10, warmup_epochs=0,
              steps_per_epoch=10, lr_noise=(0.2, 0.8), lr_noise_pct=0.3)
    a = make_schedule(OptimConfig(**kw), 1.0)
    b = make_schedule(OptimConfig(**kw), 1.0)
    base = make_schedule(
        OptimConfig(**{**kw, "lr_noise": None}), 1.0
    )
    deviated = 0
    for t in range(0, 100, 10):  # one sample per epoch
        la, lb, l0 = float(a(t)), float(b(t)), float(base(t))
        assert la == pytest.approx(lb)  # seeded → deterministic
        if 20 <= t < 80:
            assert abs(la / l0 - 1.0) <= 0.3 + 1e-6  # |noise| <= pct
            deviated += la != l0
        else:
            assert la == pytest.approx(l0)  # outside the range: exact
    assert deviated >= 4
    # noise is per-epoch, not per-step
    assert float(a(25)) == pytest.approx(float(a(29)))


def test_multistep_milestones():
    from tpuwsi.train.optim import OptimConfig, make_schedule

    cfg = OptimConfig(lr=1.0, sched="multistep", epochs=10, warmup_epochs=1,
                      warmup_lr=0.0, decay_rate=0.1,
                      decay_milestones=(3, 6), steps_per_epoch=10)
    sched = make_schedule(cfg, 1.0)
    assert float(sched(5)) == pytest.approx(0.5, abs=1e-6)  # warmup
    assert float(sched(20)) == pytest.approx(1.0)
    assert float(sched(35)) == pytest.approx(0.1)
    assert float(sched(95)) == pytest.approx(0.01)


def test_plateau_controller_and_scale_surgery():
    """torch ReduceLROnPlateau semantics + the no-recompile scale slot:
    the scale lives in opt_state and multiplies the final update."""
    from tpuwsi.train.optim import (
        OptimConfig, PlateauController, make_optimizer, set_plateau_scale,
    )

    c = PlateauController(factor=0.5, patience=1, mode="max")
    assert c.step(0.7) is None          # first metric = best
    assert c.step(0.8) is None          # improved
    assert c.step(0.8) is None          # bad epoch 1 (rel-threshold)
    assert c.step(0.79) == 0.5          # bad epoch 2 > patience → decay
    assert c.step(0.9) is None          # new best resets
    cmin = PlateauController(factor=0.5, patience=0, mode="min")
    assert cmin.step(1.0) is None
    assert cmin.step(1.0) == 0.5        # patience 0: decay on first stall

    cfg = OptimConfig(opt="sgd", lr=1.0, sched="plateau", epochs=2,
                      warmup_epochs=0, steps_per_epoch=10, momentum=0.0,
                      weight_decay=0.0)
    params = {"w": jnp.ones((4, 4))}
    tx, _ = make_optimizer(cfg, params, global_batch_size=8)
    st = tx.init(params)
    grads = {"w": jnp.full((4, 4), 0.5)}
    up1, _ = tx.update(grads, st, params)
    st2 = set_plateau_scale(st, 0.25)
    up2, _ = tx.update(grads, st2, params)
    assert np.allclose(np.asarray(up2["w"]), np.asarray(up1["w"]) * 0.25)
    # tree structure unchanged → no recompile of a jitted step
    assert (jax.tree_util.tree_structure(st)
            == jax.tree_util.tree_structure(st2))


def test_tanh_and_poly_schedules_match_timm_formula():
    import math

    from tpuwsi.train.optim import OptimConfig, make_schedule

    # tanh: lr = min + 0.5*(max-min)*(1 - tanh(-7*(1-tr) + 3*tr))
    cfg = OptimConfig(lr=1.0, sched="tanh", epochs=10, warmup_epochs=1,
                      warmup_lr=0.0, min_lr=0.01, steps_per_epoch=10)
    sched = make_schedule(cfg, 1.0)
    for t in [0, 5, 10, 30, 50, 99]:
        if t < 10:
            want = t / 10.0
        else:
            tr = t / 100.0
            want = 0.01 + 0.5 * 0.99 * (1 - math.tanh(-7 * (1 - tr) + 3 * tr))
        assert float(sched(t)) == pytest.approx(want, abs=1e-5), t
    # poly: lr = min + (max-min)*(1 - tr)^power, power = decay_rate
    cfgp = OptimConfig(lr=1.0, sched="poly", epochs=10, warmup_epochs=0,
                       min_lr=0.0, decay_rate=2.0, steps_per_epoch=10)
    sp = make_schedule(cfgp, 1.0)
    for t in [0, 25, 50, 75, 100]:
        want = (1 - t / 100.0) ** 2.0
        assert float(sp(t)) == pytest.approx(want, abs=1e-5), t
