#!/usr/bin/env python
"""On-hardware CLI surface sweep (round 4): drive the production CLIs on
the REAL TPU over a synthetic cohort — supervised WSI training, feature
extraction (``-ef``), MIL head training on the exported ``inference.data``,
and full-slide heatmap inference from the training checkpoint.

Everything here already has CPU-mesh tests (test_cli / test_mil_cli /
test_heatmap_cli); this script exists because only the hardware engages the
Pallas attention path + the tuned TPU config inside these CLIs
(use_pallas_attention=on_tpu in cli/train.py), and interpret-mode tests
cannot validate Mosaic block rules (verify-skill round-3 lesson).

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/e2e_chain_tpu.py
Prints one PASS line per surface; exits nonzero on the first failure.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
from PIL import Image


def build_cohort(tmp_path: str) -> str:
    """tests/test_cli.py wsi_cohort, materialized outside pytest."""
    from tpuwsi.io import grid_data_columns, grid_file_path, save_grid_pickle
    from tpuwsi.utils.minixlsx import write_xlsx

    root = os.path.join(tmp_path, "Breast", "TCGA")
    os.makedirs(os.path.join(root, "Grids_10"))
    rng = np.random.default_rng(0)
    files, folds, targets, counts = [], [], [], []
    for i in range(4):
        name = f"s{i}.png"
        base = 200 if i % 2 == 0 else 50
        arr = np.clip(rng.normal(base, 25, (256, 256, 3)), 0, 255)
        Image.fromarray(arr.astype(np.uint8)).save(os.path.join(root, name))
        grid = [(r, c) for r in range(0, 224, 32) for c in range(0, 224, 32)]
        save_grid_pickle(str(grid_file_path(root, name, 10, 32)), grid)
        files.append(name)
        folds.append(1 if i >= 2 else 2)
        targets.append("Positive" if i % 2 == 0 else "Negative")
        counts.append(len(grid))
    total_col, legit_col = grid_data_columns(32, 10)
    write_xlsx(os.path.join(root, "slides_data_TCGA.xlsx"), pd.DataFrame({
        "file": files, "id": ["TCGA"] * 4,
        "patient barcode": [f"P{i}" for i in range(4)],
        "ER status": targets,
        "test fold idx": folds,
        "Manipulated Objective Power": [10] * 4, "DX": [True] * 4,
    }))
    write_xlsx(os.path.join(root, "Grids_10", "Grid_data.xlsx"), pd.DataFrame(
        {"file": files, total_col: counts, legit_col: counts}))
    return tmp_path


def main():
    import jax

    backend = jax.default_backend()
    print(f"backend: {backend}")

    tmp = tempfile.mkdtemp(prefix="tpuwsi_chain_")
    cohort = build_cohort(tmp)

    from tpuwsi.cli.train import main as train_main

    # --- 1. supervised WSI training on the chip (Pallas attention ON) ---
    out = os.path.join(tmp, "runs")
    state = train_main([
        "--dataset", "TCGA", "--data-root", cohort,
        "--model", "vit_tiny_patch16_224", "--tile-size", "32",
        "-b", "4", "--epochs", "1", "--max-steps-per-epoch", "4",
        "--warmup-epochs", "0", "--opt", "adamw", "--lr", "1e-3",
        "--transform_type", "flip", "--output", out, "--eval_rate", "1",
    ])
    assert int(state.step) == 4
    print("PASS supervised WSI training (4 steps)")

    # --- 2. feature extraction CLI (-ef) on the chip ---
    out_ef = os.path.join(tmp, "runs_ef")
    train_main([
        "--dataset", "TCGA", "--data-root", cohort,
        "--model", "vit_tiny_patch16_224", "--tile-size", "32",
        "-tf", "1", "-ef", "-nt", "8", "-tpi", "4", "--output", out_ef,
    ])
    run_dir = [os.path.join(out_ef, e) for e in os.listdir(out_ef)
               if e.startswith("Exp_")][0]
    data_file = os.path.join(run_dir, "features", "inference.data")
    assert os.path.isfile(data_file), data_file
    print("PASS feature extraction -> inference.data")

    # --- 3. MIL head training on the exported features ---
    from tpuwsi.cli.mil_train import main as mil_main

    _, _, final = mil_main([
        "--features", data_file, "--bag-size", "4", "--minimum-tiles", "1",
        "--epochs", "3", "-b", "2", "--output", os.path.join(tmp, "mil"),
    ])
    print(f"PASS MIL head training (final: { {k: round(float(v), 3) for k, v in (final or {}).items()} })")

    # --- 4. heatmap CLI from the step-1 checkpoint ---
    from tpuwsi.cli.heatmap import main as heat_main

    slide = os.path.join(tmp, "hm.tif")
    arr = np.full((256, 256, 3), 120, np.uint8)
    arr[64:128, 64:128] = 230
    Image.fromarray(arr).save(slide)
    ckpt_dir = [os.path.join(out, e, "checkpoints") for e in os.listdir(out)
                if e.startswith("Exp_")][0]
    results = heat_main([
        "--slide", slide, "--slide-mag", "10", "--tile-size", "32",
        "--model", "vit_tiny_patch16_224", "--checkpoint", ckpt_dir,
        "--background-fraction", "1.0", "-tpi", "4",
        "--output", os.path.join(tmp, "heat"),
    ])
    assert results, "no heatmap produced"
    print("PASS heatmap inference")
    print(f"chain OK on {backend}")


if __name__ == "__main__":
    main()
