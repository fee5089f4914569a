"""End-to-end test for the MIL CLI (tpuwsi.cli.mil_train)."""

import os
import pickle

import numpy as np


def _write_features(path, n=16, tiles=12, dim=8, seed=0, shift=2.0):
    rng = np.random.default_rng(seed)
    feats = rng.normal(0, 1, (n, 1, tiles, dim)).astype(np.float32)
    targets = np.arange(n) % 2
    feats[targets == 1, :, :, :2] += shift
    data = (targets, targets, targets.astype(float),
            np.ones((n, tiles), np.float32),
            [f"s{seed}_{i}.svs" for i in range(n)], feats)
    with open(path, "wb") as f:
        pickle.dump(data, f)
    return path


def test_mil_cli_end_to_end(tmp_path):
    from tpuwsi.cli.mil_train import main

    train_p = _write_features(str(tmp_path / "train.data"), seed=0)
    test_p = _write_features(str(tmp_path / "test.data"), seed=1)
    out = str(tmp_path / "mil")
    model, state, final = main([
        "--features", train_p,
        "--test-features", test_p,
        "--bag-size", "8",
        "--minimum-tiles", "1",
        "--epochs", "25",
        "-b", "8",
        "--lr", "3e-3",
        "--output", out,
        "--export-xlsx",
    ])
    # separable clusters → held-out slide AUC should be perfect
    assert final["eval_auc"] == 1.0
    assert os.path.isdir(os.path.join(out, "checkpoints"))
    assert os.path.isfile(os.path.join(out, "slide_scores.xlsx"))

    # xlsx readable and carries tile scores + attention columns
    from tpuwsi.utils.minixlsx import read_xlsx

    df = read_xlsx(os.path.join(out, "slide_scores.xlsx"))
    assert len(df) == 16
    assert "slide_score" in df.columns and "tile_score_0" in df.columns
    assert any(c.startswith("attn_after_") for c in df.columns)


def test_mil_cli_registry_resolution(tmp_path, monkeypatch):
    """--dataset/--target/-tf resolve train+test locations via the JSON
    registry (utils_MIL parity)."""
    import json

    from tpuwsi.cli.mil_train import main

    train_p = _write_features(str(tmp_path / "train.data"), seed=0)
    test_p = _write_features(str(tmp_path / "test.data"), seed=1)
    reg = {
        "CAT": {"ER": {"1": {
            "TrainSet Location": {"train": train_p, "test": test_p},
        }}}
    }
    reg_path = str(tmp_path / "registry.json")
    with open(reg_path, "w") as f:
        json.dump(reg, f)
    monkeypatch.setenv("TPUWSI_FEATURE_REGISTRY", reg_path)

    _, _, final = main([
        "--dataset", "CAT", "-tar", "ER", "-tf", "1",
        "--bag-size", "8", "--minimum-tiles", "1",
        "--epochs", "10", "-b", "8", "--lr", "3e-3",
        "--output", str(tmp_path / "mil2"),
    ])
    assert "eval_auc" in final


def test_extract_features_to_mil_cli_chain(tmp_path):
    """The two-CLI production chain: cli.train --extract_features exports the
    reference-format inference.data, and cli.mil_train consumes it directly
    (SURVEY §3.4 end to end through the public entry points)."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_cli import wsi_cohort as _fixture  # reuse the cohort builder

    # materialize the cohort fixture manually (it's a pytest fixture fn)
    cohort_fn = _fixture.__wrapped__ if hasattr(_fixture, "__wrapped__") else _fixture
    cohort = cohort_fn(tmp_path / "cohort")

    from tpuwsi.cli.mil_train import main as mil_main
    from tpuwsi.cli.train import main as train_main

    out = str(tmp_path / "runs_ef")
    train_main([
        "--dataset", "TCGA", "--data-root", cohort,
        "--model", "vit_tiny_patch16_224", "--tile-size", "32",
        "-tf", "1", "-ef", "-nt", "6", "-tpi", "4", "--output", out,
    ])
    run_dir = [os.path.join(out, e) for e in os.listdir(out)
               if e.startswith("Exp_")][0]
    data_file = os.path.join(run_dir, "features", "inference.data")
    assert os.path.isfile(data_file)

    model, state, final = mil_main([
        "--features", data_file,
        "--bag-size", "4",
        "--minimum-tiles", "1",
        "--epochs", "3",
        "-b", "2",
        "--output", str(tmp_path / "mil_out"),
        "--export-xlsx",
    ])
    assert os.path.isfile(os.path.join(str(tmp_path / "mil_out"),
                                       "slide_scores.xlsx"))
