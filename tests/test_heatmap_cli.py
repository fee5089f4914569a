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


def test_heatmap_cli_requires_slides():
    import pytest

    from tpuwsi.cli.heatmap import main

    with pytest.raises(SystemExit):
        main(["--output", "/tmp/x"])
