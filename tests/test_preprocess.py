import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuwsi.preprocess import MEAN, STD, make_recipe, normalize, denormalize
from tpuwsi.preprocess import augment as A
from tpuwsi.preprocess.multicrop import MultiCropConfig, make_multicrop


def _batch(key, b=16, s=64):
    return jax.random.randint(key, (b, s, s, 3), 0, 256, dtype=jnp.int32).astype(
        jnp.uint8
    )


def test_all_recipes_run_and_shapes():
    imgs = _batch(jax.random.PRNGKey(0), b=4, s=128)
    for name in [
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
    ]:
        fn = make_recipe(name, train=True, tile_size=128)
        out = fn(jax.random.PRNGKey(1), imgs)
        assert out.shape == imgs.shape, name
        assert out.dtype == jnp.float32


def test_eval_transform_is_pure_normalize():
    imgs = _batch(jax.random.PRNGKey(0), b=2, s=32)
    fn = make_recipe("cbnfrsc", train=False, tile_size=32, norm_type="Ron")
    out = fn(jax.random.PRNGKey(1), imgs)
    expected = normalize(imgs.astype(jnp.float32) / 255.0, "Ron")
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-6)


def test_normalize_denormalize_roundtrip():
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 8, 8, 3))
    for bank in MEAN:
        y = denormalize(normalize(x, bank), bank)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)


def test_flip_probability_half():
    img = jnp.zeros((4, 4, 3)).at[0, 0, 0].set(1.0)
    keys = jax.random.split(jax.random.PRNGKey(0), 2000)
    flipped = jax.vmap(lambda k: A.random_vflip(k, img)[0, 0, 0] == 0.0)(keys)
    rate = float(jnp.mean(flipped))
    assert 0.45 < rate < 0.55


def test_rot90_uniform():
    img = jnp.zeros((4, 4, 3)).at[0, 0, 0].set(1.0)
    keys = jax.random.split(jax.random.PRNGKey(1), 4000)

    def corner(k):
        r = A.random_rot90(k, img)
        return jnp.stack(
            [r[0, 0, 0], r[3, 0, 0], r[3, 3, 0], r[0, 3, 0]]
        )

    counts = jax.vmap(corner)(keys).sum(0)
    for c in np.asarray(counts):
        assert 850 < c < 1150  # ~1000 each


def test_cutout_hole_area():
    img = jnp.ones((256, 256, 3))
    out = A.cutout(jax.random.PRNGKey(3), img, length=100, fill=0.0)
    zeros = float((np.asarray(out[..., 0]) == 0).sum())
    assert 2500 <= zeros <= 10000  # clipped square between 50² and 100²


def test_mean_pixel_regularization_rate():
    img = jnp.zeros((2, 2, 3))
    keys = jax.random.split(jax.random.PRNGKey(4), 2000)
    replaced = jax.vmap(
        lambda k: A.mean_pixel_regularization(k, img)[0, 0, 0] > 0
    )(keys)
    rate = float(jnp.mean(replaced))
    assert 0.70 < rate < 0.80  # p=0.75 (transformations.py:98)


def test_gaussian_noise_statistics():
    img = jnp.full((64, 64, 3), 0.5)
    out = A.gaussian_noise(jax.random.PRNGKey(5), img, (0.05, 0.05))
    std = float(jnp.std(out - img))
    assert 0.03 < std < 0.07


def test_color_jitter_brightness_range():
    img = jnp.full((8, 8, 3), 0.5)
    keys = jax.random.split(jax.random.PRNGKey(6), 500)
    params = A.jitter_params(brightness=(0.85, 1.15), contrast=None,
                             saturation=None, hue=None)
    vals = jax.vmap(lambda k: A.color_jitter(k, img, *params)[0, 0, 0])(keys)
    vals = np.asarray(vals)
    assert vals.min() >= 0.5 * 0.85 - 1e-6 and vals.max() <= 0.5 * 1.15 + 1e-6
    assert vals.std() > 0.01


def test_zoom_only_enlarges():
    # zoom-in: corners of the zoomed image come from interior pixels.
    img = jnp.zeros((32, 32, 3)).at[0, 0, 0].set(1.0)
    out = A.random_zoom(jax.random.PRNGKey(7), img, (1.2, 1.2))
    assert float(out[0, 0, 0]) < 1.0  # corner pulled inward


def test_multicrop_shapes_and_norm():
    cfg = MultiCropConfig(global_size=64, local_size=32, n_local=3)
    fn = make_multicrop(cfg)
    imgs = _batch(jax.random.PRNGKey(8), b=2, s=96)
    gl, loc = fn(jax.random.PRNGKey(9), imgs)
    assert gl.shape == (2, 2, 64, 64, 3)
    assert loc.shape == (2, 3, 32, 32, 3)


def test_recipe_is_jittable():
    fn = jax.jit(make_recipe("cbnfrsc", train=True, tile_size=64))
    imgs = _batch(jax.random.PRNGKey(10), b=2, s=64)
    out = fn(jax.random.PRNGKey(11), imgs)
    assert out.shape == imgs.shape


def test_gaussian_blur_mxu_matches_exact_kernel():
    """The matmul-form blur must apply the EXACT row-normalized Gaussian
    (the 3-tap kernel truncates ~60% of the mass at DINO's sigma=2)."""
    import jax
    import jax.numpy as jnp

    from tpuwsi.preprocess.augment import gaussian_blur

    # impulse response at the center of a 33x33 image, fixed sigma via a
    # degenerate range
    img = jnp.zeros((33, 33, 1)).at[16, 16, 0].set(1.0)
    out = np.asarray(gaussian_blur(jax.random.PRNGKey(0), img, (2.0, 2.0)))
    d = np.arange(33) - 16.0
    w = np.exp(-0.5 * (d / 2.0) ** 2)
    w = w / w.sum()
    expected = np.outer(w, w)
    np.testing.assert_allclose(out[..., 0], expected, atol=1e-5)
    # separable + normalized: total mass preserved
    assert abs(out.sum() - 1.0) < 1e-4
