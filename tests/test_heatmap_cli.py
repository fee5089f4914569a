"""End-to-end test for the full-slide heatmap CLI (tpuwsi.cli.heatmap)."""

import os

import numpy as np
from PIL import Image


def test_heatmap_cli_end_to_end(tmp_path):
    from tpuwsi.cli.heatmap import main

    # 512² slide: bright left half, dark right half (tile_size 128 → 4×4 grid)
    arr = np.zeros((512, 512, 3), np.uint8)
    arr[:, :256] = 200
    arr[:, 256:] = 40
    slide = str(tmp_path / "s1.tif")
    Image.fromarray(arr).save(slide)

    listing = str(tmp_path / "Infer_Slides.txt")
    with open(listing, "w") as f:
        f.write("s1.tif\n")

    out = str(tmp_path / "heat")
    results = main([
        "--slides-file", listing,
        "--slide-mag", "10",
        "--desired-mag", "10",
        "--tile-size", "128",
        "--model", "vit_tiny_patch16_224",
        "--background-fraction", "1.0",
        "-tpi", "8",
        "--output", out,
    ])
    assert "s1" in results
    heat = np.load(os.path.join(out, "s1.heatmap.npy"))
    assert heat.shape == (4, 4)
    # every grid cell scored (background fraction 1.0), values are probs
    assert np.isfinite(heat).all()
    assert ((heat >= 0) & (heat <= 1)).all()
    assert os.path.isfile(os.path.join(out, "s1.heatmap.png"))


def test_heatmap_scanned_dispatch_matches(tmp_path):
    """--eval-steps-per-dispatch 2 (scanned serving driver) must produce a
    bit-identical heatmap to the per-chunk run: 4x4 grid at -tpi 8 gives
    2 full-shape chunks per slide → one scan stack."""
    from tpuwsi.cli.heatmap import main

    arr = np.zeros((512, 512, 3), np.uint8)
    arr[:, :256] = 200
    arr[:, 256:] = 40
    slide = str(tmp_path / "s1.tif")
    Image.fromarray(arr).save(slide)
    listing = str(tmp_path / "Infer_Slides.txt")
    with open(listing, "w") as f:
        f.write("s1.tif\n")

    common = [
        "--slides-file", listing, "--slide-mag", "10", "--desired-mag", "10",
        "--tile-size", "128", "--model", "vit_tiny_patch16_224",
        "--background-fraction", "1.0", "-tpi", "8", "--seed", "0",
    ]
    main(common + ["--output", str(tmp_path / "h1")])
    main(common + ["--eval-steps-per-dispatch", "2",
                   "--output", str(tmp_path / "h2")])
    a = np.load(os.path.join(str(tmp_path / "h1"), "s1.heatmap.npy"))
    b = np.load(os.path.join(str(tmp_path / "h2"), "s1.heatmap.npy"))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_heatmap_cli_requires_slides():
    import pytest

    from tpuwsi.cli.heatmap import main

    with pytest.raises(SystemExit):
        main(["--output", "/tmp/x"])


def test_heatmap_restores_full_training_checkpoint(tmp_path):
    """Training checkpoints carry the FULL TrainState (opt_state + EMA);
    the heatmap CLI must restore them without a structure mismatch and
    prefer the EMA weights (review finding r3-s3)."""
    import jax
    import jax.numpy as jnp
    import optax

    from tpuwsi.cli.heatmap import main
    from tpuwsi.models.registry import create_model
    from tpuwsi.train.checkpoint import CheckpointManager
    from tpuwsi.train.state import create_train_state

    model = create_model(
        "vit_tiny_patch16_224", num_classes=2, img_size=128,
        use_pallas_attention=False,
    )
    params = model.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 128, 128, 3), jnp.float32)
    )
    tx = optax.adamw(1e-3)
    state = create_train_state(params, tx, ema=True)
    ckpt_dir = str(tmp_path / "ckpts")
    mgr = CheckpointManager(ckpt_dir)
    mgr.save(1, state, {"auc": 0.5})
    mgr.wait()

    arr = np.full((256, 256, 3), 120, np.uint8)
    slide = str(tmp_path / "s.tif")
    Image.fromarray(arr).save(slide)
    results = main([
        "--slide", slide, "--slide-mag", "10", "--tile-size", "128",
        "--model", "vit_tiny_patch16_224",
        "--checkpoint", ckpt_dir,
        "--background-fraction", "1.0", "-tpi", "4",
        "--output", str(tmp_path / "heat"),
    ])
    assert np.isfinite(list(results.values())[0])


def test_heatmap_img_size_resizes(tmp_path):
    """--img-size != tile-size must resample the tiles to the model input
    size (previously the ViT silently ran at tile resolution)."""
    from tpuwsi.cli.heatmap import main

    arr = np.random.default_rng(0).integers(
        0, 255, (256, 256, 3), dtype=np.uint8
    ).astype(np.uint8)
    slide = str(tmp_path / "s.tif")
    Image.fromarray(arr).save(slide)
    results = main([
        "--slide", slide, "--slide-mag", "10", "--tile-size", "128",
        "--img-size", "64", "--model", "vit_tiny_patch16_224",
        "--background-fraction", "1.0", "-tpi", "4",
        "--output", str(tmp_path / "heat"),
    ])
    assert np.isfinite(list(results.values())[0])


def test_heatmap_with_tissue_grid_dir(tmp_path):
    """--grid-dir: tiles on the precomputed tissue grid are flagged tissue
    and score the slide; off-grid background is sampled at
    --background-fraction (datasets.py:2222-2230 surface)."""
    from tpuwsi.cli.heatmap import main
    from tpuwsi.io.grids import grid_file_path, save_grid_pickle

    # bright tissue in the left half, dark background right
    arr = np.zeros((512, 512, 3), np.uint8)
    arr[:, :256] = 200
    arr[:, 256:] = 30
    slide = str(tmp_path / "s2.tif")
    Image.fromarray(arr).save(slide)

    # tissue grid = the 8 left-half tiles (tile_size 128 level-0 grid)
    grid = [(top, left) for top in range(0, 512, 128) for left in (0, 128)]
    gpath = grid_file_path(str(tmp_path), "s2.tif", 10, 128)
    save_grid_pickle(gpath, grid)

    out = str(tmp_path / "heat")
    results = main([
        "--slide", slide, "--slide-mag", "10", "--tile-size", "128",
        "--model", "vit_tiny_patch16_224",
        "--grid-dir", str(tmp_path),
        "--background-fraction", "0.0",   # tissue tiles only
        "-tpi", "4", "--output", out,
    ])
    heat = np.load(os.path.join(out, "s2.heatmap.npy"))
    assert heat.shape == (4, 4)
    # only the 8 tissue cells are scored; background cells stay NaN
    assert np.isfinite(heat[:, :2]).all()
    assert np.isnan(heat[:, 2:]).all()
    assert np.isfinite(results["s2"])
