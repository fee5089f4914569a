import os

import numpy as np
import pandas as pd
import pytest
from PIL import Image

from tpuwsi.cli.args import parse_args
from tpuwsi.io import grid_data_columns, grid_file_path, save_grid_pickle
from tpuwsi.utils.minixlsx import write_xlsx


def test_args_defaults_and_gipmed_flags():
    args = parse_args([])
    assert args.model == "vit_small_patch16_224_dino"
    assert args.test_fold == 1 and args.mag == 10
    args = parse_args(["-tar", "Her2", "-tf", "2", "--transform_type", "cbnfrsc",
                       "-nt", "100", "-tpi", "50", "-ef", "--focal"])
    assert args.target == "Her2" and args.test_fold == 2
    assert args.num_tiles == 100 and args.tiles_per_iter == 50
    assert args.extract_features and args.focal


def test_args_config_yaml(tmp_path):
    cfg = tmp_path / "c.yaml"
    cfg.write_text("batch_size: 16\ntarget: PR\nmag: 20\n")
    args = parse_args(["--config", str(cfg)])
    assert args.batch_size == 16 and args.target == "PR" and args.mag == 20
    # command line wins over config
    args = parse_args(["--config", str(cfg), "-tar", "ER"])
    assert args.target == "ER"


@pytest.fixture
def patch_folder(tmp_path):
    rng = np.random.default_rng(0)
    for cls, base in (("neg", 40), ("pos", 200)):
        os.makedirs(tmp_path / "train" / cls)
        for i in range(8):
            arr = np.clip(rng.normal(base, 20, (32, 32, 3)), 0, 255).astype(np.uint8)
            Image.fromarray(arr).save(tmp_path / "train" / cls / f"{i}.png")
    return str(tmp_path / "train")


def test_cli_folder_mode_end_to_end(patch_folder, tmp_path):
    from tpuwsi.cli.train import main

    out = str(tmp_path / "runs")
    state = main([
        "--data-dir", patch_folder,
        "--model", "vit_tiny_patch16_224",
        "--img-size", "32",
        "-b", "8",
        "--epochs", "1",
        "--max-steps-per-epoch", "2",
        "--warmup-epochs", "0",
        "--opt", "adamw",
        "--lr", "1e-3",
        "--transform_type", "flip",
        "--output", out,
        "--log-interval", "1",
        "--eval_rate", "100",
        "--val-split", "0",
    ])
    assert int(state.step) == 2
    # ledger + summary written
    exps = os.listdir(out)
    assert any(e.startswith("Exp_1-ER") for e in exps)
    run_dir = os.path.join(out, [e for e in exps if e.startswith("Exp_")][0])
    assert os.path.isfile(os.path.join(run_dir, "summary.csv"))
    assert os.path.isdir(os.path.join(run_dir, "checkpoints"))


@pytest.fixture
def wsi_cohort(tmp_path):
    root = tmp_path / "Breast" / "TCGA"
    os.makedirs(root / "Grids_10")
    rng = np.random.default_rng(0)
    files, folds, targets, counts = [], [], [], []
    for i in range(4):
        name = f"s{i}.png"
        base = 200 if i % 2 == 0 else 50
        arr = np.clip(rng.normal(base, 25, (256, 256, 3)), 0, 255).astype(np.uint8)
        Image.fromarray(arr).save(root / name)
        grid = [(r, c) for r in range(0, 224, 32) for c in range(0, 224, 32)]
        save_grid_pickle(str(grid_file_path(str(root), name, 10, 32)), grid)
        files.append(name)
        folds.append(1 if i >= 2 else 2)
        targets.append("Positive" if i % 2 == 0 else "Negative")
        counts.append(len(grid))
    total_col, legit_col = grid_data_columns(32, 10)
    write_xlsx(str(root / "slides_data_TCGA.xlsx"), pd.DataFrame({
        "file": files, "id": ["TCGA"] * 4,
        "patient barcode": [f"P{i}" for i in range(4)],
        "ER status": targets,
        # second receptor column for multi-target ('+') runs; one slide has
        # missing data to exercise the -1 label mask
        "Her2 status": ["Negative", "Positive", "Missing Data", "Positive"],
        "test fold idx": folds,
        "Manipulated Objective Power": [10] * 4, "DX": [True] * 4,
    }))
    write_xlsx(str(root / "Grids_10" / "Grid_data.xlsx"), pd.DataFrame(
        {"file": files, total_col: counts, legit_col: counts}))
    return str(tmp_path)


def test_cli_wsi_mode_with_eval(wsi_cohort, tmp_path):
    from tpuwsi.cli.train import main

    out = str(tmp_path / "runs")
    state = main([
        "--dataset", "TCGA",
        "--data-root", wsi_cohort,
        "--model", "vit_tiny_patch16_224",
        "--tile-size", "32",
        "-b", "4",
        "--epochs", "1",
        "--max-steps-per-epoch", "2",
        "--warmup-epochs", "0",
        "--opt", "adamw",
        "--lr", "1e-3",
        "--transform_type", "flip",
        "--output", out,
        "--eval_rate", "1",
        "--n_patches_test", "4",
        "-tpi", "4",
        "-tf", "1",
    ])
    assert int(state.step) == 2
    run_dir = [os.path.join(out, e) for e in os.listdir(out)
               if e.startswith("Exp_")][0]
    import csv

    rows = list(csv.DictReader(open(os.path.join(run_dir, "summary.csv"))))
    assert "eval_auc" in rows[0]


def test_cli_wsi_eval_scanned_dispatch_matches(wsi_cohort, tmp_path):
    """--eval-steps-per-dispatch 2 routes evaluate_slides through the
    lax.scan'd serving driver; with a fixed seed the eval AUCs must equal
    the per-chunk dispatch run's exactly."""
    import csv

    from tpuwsi.cli.train import main

    common = [
        "--dataset", "TCGA", "--data-root", wsi_cohort,
        "--model", "vit_tiny_patch16_224", "--tile-size", "32",
        "-b", "4", "--epochs", "1", "--max-steps-per-epoch", "2",
        "--warmup-epochs", "0", "--opt", "adamw", "--lr", "1e-3",
        "--transform_type", "flip", "--eval_rate", "1",
        "--n_patches_test", "4", "-tpi", "4", "-tf", "1", "--seed", "0",
    ]

    def run(extra, out):
        main(common + extra + ["--output", out])
        run_dir = [os.path.join(out, e) for e in os.listdir(out)
                   if e.startswith("Exp_")][0]
        rows = list(csv.DictReader(
            open(os.path.join(run_dir, "summary.csv"))))
        return rows[-1]

    base = run([], str(tmp_path / "r1"))
    scanned = run(["--eval-steps-per-dispatch", "2"], str(tmp_path / "r2"))
    assert base["eval_auc"] == scanned["eval_auc"]
    assert base["eval_patch_auc"] == scanned["eval_patch_auc"]


def test_cli_ssl_mode(patch_folder, tmp_path):
    from tpuwsi.cli.train import main

    out = str(tmp_path / "runs")
    state = main([
        "--ssl",
        "--data-dir", patch_folder,
        "--model", "vit_tiny_patch16_224",
        "-b", "4",
        "--epochs", "1",
        "--max-steps-per-epoch", "1",
        "--warmup-epochs", "0",
        "--lr", "1e-4",
        "--dino-out-dim", "128",
        "--dino-global-size", "32",
        "--dino-local-size", "16",
        "--dino-local-crops", "2",
        "--output", out,
    ])
    assert int(state.step) == 1


def test_cli_ssl_knn_probe(patch_folder, tmp_path):
    """--knn-eval-rate: the DINO kNN probe (teacher CLS features) runs at
    epoch cadence in folder-mode SSL and lands in summary.csv."""
    import csv

    from tpuwsi.cli.train import main

    out = str(tmp_path / "runs_knn")
    main([
        "--ssl", "--data-dir", patch_folder,
        "--model", "vit_tiny_patch16_224",
        "-b", "4", "--epochs", "1", "--max-steps-per-epoch", "1",
        "--warmup-epochs", "0", "--lr", "1e-4",
        "--dino-out-dim", "128", "--dino-global-size", "32",
        "--dino-local-size", "16", "--dino-local-crops", "2",
        "--knn-eval-rate", "1",
        "--output", out,
    ])
    run_dir = [os.path.join(out, e) for e in os.listdir(out)
               if e.startswith("Exp_")][0]
    rows = list(csv.DictReader(open(os.path.join(run_dir, "summary.csv"))))
    acc = float(rows[0]["eval_knn_acc"])
    # brightness classes separate linearly even at near-init weights
    assert 0.0 <= acc <= 1.0
    # WSI mode has no labels: the flag must refuse, not silently skip
    with pytest.raises(SystemExit, match="folder-mode"):
        main([
            "--ssl", "--dataset", "TCGA", "--knn-eval-rate", "1",
            "--data-root", str(tmp_path / "nope"), "--output", out,
        ])


def test_cli_extract_features_mode(wsi_cohort, tmp_path):
    from tpuwsi.cli.train import main

    out = str(tmp_path / "runs_ef")
    agg = main([
        "--dataset", "TCGA",
        "--data-root", wsi_cohort,
        "--model", "vit_tiny_patch16_224",
        "--tile-size", "32",
        "-tf", "1",
        "-ef",
        "-nt", "6",
        "-tpi", "4",
        "--output", out,
    ])
    # features extracted for the fold-1 slides, reference-format export exists
    assert len(agg.results) == 2
    assert agg.results[0].features.shape[1] == 192  # ViT-T embed dim
    run_dir = [os.path.join(out, e) for e in os.listdir(out)
               if e.startswith("Exp_")][0]
    feat_dir = os.path.join(run_dir, "features")
    assert os.path.isfile(os.path.join(feat_dir, "inference.data"))
    import glob

    assert len(glob.glob(os.path.join(feat_dir, "*_features.pt"))) == 2


def test_cli_extract_features_quantized(wsi_cohort, tmp_path):
    """--quantize int8 extraction (ops/quant.py): same export surface, and
    the int8 features must stay directionally faithful to the f32 ones
    (they feed cosine/linear MIL heads downstream)."""
    from tpuwsi.cli.train import main

    common = [
        "--dataset", "TCGA", "--data-root", wsi_cohort,
        "--model", "vit_tiny_patch16_224", "--tile-size", "32",
        "-tf", "1", "-ef", "-nt", "6", "-tpi", "4", "--seed", "0",
    ]
    f32 = main(common + ["--output", str(tmp_path / "runs_f32")])
    q = main(common + ["--quantize", "int8",
                       "--output", str(tmp_path / "runs_q")])
    assert len(q.results) == len(f32.results) == 2
    for a, b in zip(f32.results, q.results):
        fa, fb = np.asarray(a.features), np.asarray(b.features)
        assert fa.shape == fb.shape
        cos = (fa * fb).sum(-1) / (
            np.linalg.norm(fa, axis=-1) * np.linalg.norm(fb, axis=-1))
        assert cos.min() > 0.99, cos.min()


def test_cli_extract_single_forward_matches_dual(wsi_cohort, tmp_path,
                                                 monkeypatch):
    """The single-forward extraction step (feats @ head Dense, one backbone
    pass) must reproduce the two-forward path's probs AND features exactly:
    same normalize, same backbone, and the head is a plain f32 Dense on the
    cls features, so logits differ only by GEMM association order."""
    from tpuwsi.cli import train as cli_train

    common = [
        "--dataset", "TCGA", "--data-root", wsi_cohort,
        "--model", "vit_tiny_patch16_224", "--tile-size", "32",
        "-tf", "1", "-ef", "-nt", "6", "-tpi", "4", "--seed", "0",
    ]
    single = cli_train.main(common + ["--output", str(tmp_path / "r_one")])
    # scanned serving driver (--eval-steps-per-dispatch): 4 walker chunks at
    # k=3 → one full stack + one padded partial; must be chunk-for-chunk
    # identical to the per-chunk dispatch path
    scanned = cli_train.main(common + [
        "--eval-steps-per-dispatch", "3", "--output", str(tmp_path / "r_k3")])
    monkeypatch.setattr(cli_train, "_find_head_dense", lambda params: None)
    dual = cli_train.main(common + ["--output", str(tmp_path / "r_two")])
    assert len(single.results) == len(dual.results) == 2
    for a, b in zip(single.results, dual.results):
        np.testing.assert_allclose(
            np.asarray(a.features), np.asarray(b.features), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(a.tile_probs), np.asarray(b.tile_probs), atol=1e-5)
    for a, c in zip(single.results, scanned.results):
        np.testing.assert_allclose(
            np.asarray(a.features), np.asarray(c.features), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(a.tile_probs), np.asarray(c.tile_probs), atol=1e-6)


def test_cli_quantize_rejects_cnn():
    from tpuwsi.models.registry import create_model

    with pytest.raises(ValueError, match="quantize"):
        create_model("resnet50", quant_int8=True)


def test_cli_folder_mode_validation(tmp_path):
    """Folder mode must validate per epoch (timm_train.py:951-1025 parity):
    eval metrics exist in summary.csv and the best checkpoint tracks them.
    Uses an explicit train/ + val/ tree (timm convention)."""
    import csv

    from tpuwsi.cli.train import main

    rng = np.random.default_rng(0)
    for split, n in (("train", 8), ("val", 4)):
        for cls, base in (("neg", 40), ("pos", 200)):
            os.makedirs(tmp_path / "data" / split / cls)
            for i in range(n):
                arr = np.clip(
                    rng.normal(base, 20, (32, 32, 3)), 0, 255
                ).astype(np.uint8)
                Image.fromarray(arr).save(
                    tmp_path / "data" / split / cls / f"{i}.png"
                )
    out = str(tmp_path / "runs")
    main([
        "--data-dir", str(tmp_path / "data"),
        "--model", "vit_tiny_patch16_224",
        "--img-size", "32",
        "-b", "8",
        "--epochs", "1",
        "--max-steps-per-epoch", "2",
        "--warmup-epochs", "0",
        "--opt", "adamw",
        "--lr", "1e-3",
        "--transform_type", "flip",
        "--output", out,
        "--eval_rate", "1",
        "--eval-metric", "top1",
    ])
    run_dir = os.path.join(
        out, [e for e in os.listdir(out) if e.startswith("Exp_")][0]
    )
    rows = list(csv.DictReader(open(os.path.join(run_dir, "summary.csv"))))
    assert "eval_top1" in rows[0], rows[0].keys()
    assert 0.0 <= float(rows[0]["eval_top1"]) <= 1.0
    assert "eval_top5" in rows[0]
    assert "eval_auc" in rows[0]  # binary folder → AUC reported
    # checkpoint ranking consumed the eval metric
    ckpts = os.path.join(run_dir, "checkpoints")
    assert os.path.isdir(ckpts) and len(os.listdir(ckpts)) > 0


def test_config_recipes_parse():
    """configs/ YAML recipes (run-book parity, train_instruct.txt:16-31) load
    through the two-stage --config parse and set the expected fields."""
    from tpuwsi.cli.args import parse_args

    root = os.path.join(os.path.dirname(__file__), "..", "configs")
    a = parse_args(["--config", os.path.join(root, "ssl.yaml")])
    assert a.ssl and a.model == "vit_small_patch16_224_dino"
    assert a.batch_size == 1024 and a.dataset == "CAT"
    a = parse_args(["--config", os.path.join(root, "supervised.yaml")])
    assert a.supervised and a.opt == "adam" and a.sched == "cosine"
    # command line wins over config values
    a = parse_args(["--config", os.path.join(root, "supervised.yaml"),
                    "-b", "32"])
    assert a.batch_size == 32
    a = parse_args(["--config", os.path.join(root, "extract-features.yaml")])
    assert a.extract_features
    a = parse_args(["--config", os.path.join(root, "timm-folder.yaml")])
    assert a.transform_type == "timm" and a.mixup == 0.8 and a.model_ema
    assert a.aa == "rand-m9-mstd0.5" and a.train_interpolation == "random"


@pytest.fixture
def survival_cli_cohort(tmp_path):
    """Synthetic survival cohort with a risk signal: darker slides die
    earlier (tile brightness ∝ survival months)."""
    root = tmp_path / "Breast" / "ABCTB_TIF"
    os.makedirs(root / "Grids_10")
    rng = np.random.default_rng(1)
    files, censored, months, status, folds, counts = [], [], [], [], [], []
    for i in range(8):
        name = f"s{i}.png"
        base = 40 + 24 * i  # brightness encodes survival
        arr = np.clip(rng.normal(base, 10, (256, 256, 3)), 0, 255).astype(np.uint8)
        Image.fromarray(arr).save(root / name)
        grid = [(r, c) for r in range(0, 224, 32) for c in range(0, 224, 32)]
        save_grid_pickle(str(grid_file_path(str(root), name, 10, 32)), grid)
        files.append(name)
        censored.append(0)
        months.append(12.0 * (i + 1))
        status.append("Positive" if i >= 4 else "Negative")
        folds.append(1 if i % 2 == 0 else 2)  # fold 1 = test
        counts.append(len(grid))
    total_col, legit_col = grid_data_columns(32, 10)
    write_xlsx(str(root / "slides_data_ABCTB_TIF.xlsx"), pd.DataFrame({
        "file": files, "id": ["ABCTB_TIF"] * 8,
        "patient barcode": [f"P{i}" for i in range(8)],
        "Censored": censored,
        "Follow-up Months Since Diagnosis": months,
        "survival status": status,
        "Exclude for time prediction?": [""] * 8,
        "test fold idx": folds,
        "Manipulated Objective Power": [10] * 8,
    }))
    write_xlsx(str(root / "Grids_10" / "Grid_data.xlsx"), pd.DataFrame(
        {"file": files, total_col: counts, legit_col: counts}))
    return str(tmp_path)


def test_cli_survival_time_end_to_end(survival_cli_cohort, tmp_path):
    """VERDICT r2 #2: the reference's DEFAULT target (-tar Survival_Time,
    train.py:370) must route through the Cox step and produce a slide-level
    C-index in summary.csv."""
    from tpuwsi.cli.train import main

    out = str(tmp_path / "runs")
    state = main([
        "--dataset", "ABCTB_TIF",
        "--data-root", survival_cli_cohort,
        "--model", "vit_tiny_patch16_224",
        "--tile-size", "32",
        "-b", "4",
        "--epochs", "1",
        "--max-steps-per-epoch", "2",
        "--warmup-epochs", "0",
        "--opt", "adamw",
        "--lr", "1e-3",
        "--transform_type", "flip",
        "--output", out,
        "--eval_rate", "1",
        "--n_patches_test", "4",
        "-tpi", "4",
        "-tf", "1",
        "-tar", "Survival_Time",
    ])
    assert int(state.step) == 2
    run_dir = [os.path.join(out, e) for e in os.listdir(out)
               if e.startswith("Exp_")][0]
    import csv

    rows = list(csv.DictReader(open(os.path.join(run_dir, "summary.csv"))))
    assert "eval_c_index" in rows[0]
    assert 0.0 <= float(rows[0]["eval_c_index"]) <= 1.0
    assert "train_c_index" in rows[0]


def test_cli_survival_binary_end_to_end(survival_cli_cohort, tmp_path):
    from tpuwsi.cli.train import main

    out = str(tmp_path / "runs")
    state = main([
        "--dataset", "ABCTB_TIF",
        "--data-root", survival_cli_cohort,
        "--model", "vit_tiny_patch16_224",
        "--tile-size", "32",
        "-b", "4",
        "--epochs", "1",
        "--max-steps-per-epoch", "2",
        "--warmup-epochs", "0",
        "--opt", "adamw",
        "--lr", "1e-3",
        "--transform_type", "flip",
        "--output", out,
        "--eval_rate", "1",
        "--n_patches_test", "4",
        "-tpi", "4",
        "-tf", "1",
        "-tar", "Survival_Binary",
    ])
    assert int(state.step) == 2
    run_dir = [os.path.join(out, e) for e in os.listdir(out)
               if e.startswith("Exp_")][0]
    import csv

    rows = list(csv.DictReader(open(os.path.join(run_dir, "summary.csv"))))
    assert "train_auc" in rows[0]


def test_no_grad_freezes_backbone(patch_folder, tmp_path):
    """VERDICT r2 #4: --no-grad (train.py:498-503) must leave every backbone
    leaf bit-identical while the head trains."""
    import flax
    import jax
    import jax.numpy as jnp
    import optax

    from tpuwsi.models.registry import create_model
    from tpuwsi.train import create_train_state, make_train_step
    from tpuwsi.train.losses import cross_entropy
    from tpuwsi.train.optim import freeze_non_head

    model = create_model("vit_tiny_patch16_224", num_classes=2, img_size=32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    tx = freeze_non_head(optax.adamw(1e-2), params)
    state = create_train_state(params, tx)
    step = jax.jit(make_train_step(
        model.apply, tx,
        augment_fn=lambda k, im: im.astype(jnp.float32) / 255.0,
        loss_fn=lambda l, y: cross_entropy(l, y, 0.0),
    ))
    rng = np.random.default_rng(0)
    for i in range(3):
        batch = {
            "images": jnp.asarray(
                rng.integers(0, 255, (4, 32, 32, 3), dtype=np.uint8)
            ),
            "labels": jnp.asarray(rng.integers(0, 2, (4,))),
        }
        state, _ = step(state, batch, jax.random.PRNGKey(i))

    before = flax.traverse_util.flatten_dict(flax.core.unfreeze(params))
    after = flax.traverse_util.flatten_dict(flax.core.unfreeze(state.params))
    head_changed = backbone_same = 0
    for k, v0 in before.items():
        same = np.array_equal(np.asarray(v0), np.asarray(after[k]))
        if any("head" in str(p) for p in k):
            if not same:
                head_changed += 1
        else:
            assert same, f"backbone leaf {k} changed under --no-grad"
            backbone_same += 1
    assert head_changed > 0 and backbone_same > 0


def test_cli_no_grad_and_experiment_flags(patch_folder, tmp_path):
    """--no-grad must run end-to-end; --experiment must name the run dir."""
    from tpuwsi.cli.train import main

    out = str(tmp_path / "runs")
    main([
        "--data-dir", patch_folder,
        "--model", "vit_tiny_patch16_224",
        "--img-size", "32",
        "-b", "8",
        "--epochs", "1",
        "--max-steps-per-epoch", "1",
        "--warmup-epochs", "0",
        "--transform_type", "flip",
        "--output", out,
        "--eval_rate", "100",
        "--val-split", "0",
        "--no-grad",
        "--experiment", "myexp",
        "--num-classes", "2",
    ])
    assert any("myexp" in e for e in os.listdir(out))


def test_cli_timm_batch_augs(patch_folder, tmp_path):
    """--aa/--mixup/--cutmix/--reprob end-to-end (timm_train.py:238-271)."""
    from tpuwsi.cli.train import main

    out = str(tmp_path / "runs")
    state = main([
        "--data-dir", patch_folder,
        "--model", "vit_tiny_patch16_224",
        "--img-size", "32",
        "-b", "8",
        "--epochs", "1",
        "--max-steps-per-epoch", "2",
        "--warmup-epochs", "0",
        "--transform_type", "flip",
        "--output", out,
        "--eval_rate", "100",
        "--val-split", "0",
        "--aa", "rand-m9-mstd0.5",
        "--mixup", "0.8",
        "--cutmix", "1.0",
        "--reprob", "0.25",
    ])
    assert int(state.step) == 2


def test_cli_augmix_jsd_aug_splits(patch_folder, tmp_path):
    """The full AugMix training protocol (timm_train.py:614-663): 3
    augmentation splits per sample (split 0 clean, shared crop), AugMix
    secondary policy, erasing skipping the clean split (--resplit), and
    the Jensen-Shannon consistency loss over the concat batch."""
    from tpuwsi.cli.train import main

    state = main([
        "--data-dir", patch_folder,
        "--model", "vit_tiny_patch16_224",
        "--img-size", "32",
        "-b", "8",
        "--epochs", "1",
        "--max-steps-per-epoch", "2",
        "--warmup-epochs", "0",
        "--transform_type", "timm",
        "--output", str(tmp_path / "runs"),
        "--eval_rate", "100",
        "--val-split", "0",
        "--aa", "augmix-m3-w3",
        "--aug-splits", "3",
        "--jsd-loss",
        "--resplit",
        "--reprob", "0.25",
    ])
    assert int(state.step) == 2


def test_cli_jsd_and_splits_guards(patch_folder, tmp_path):
    from tpuwsi.cli.train import main

    base = [
        "--data-dir", patch_folder, "--model", "vit_tiny_patch16_224",
        "--img-size", "32", "-b", "8", "--epochs", "1",
        "--max-steps-per-epoch", "1", "--transform_type", "timm",
        "--output", str(tmp_path / "runs"), "--val-split", "0",
    ]
    with pytest.raises(SystemExit, match="aug-splits"):
        main(base + ["--jsd-loss"])  # JSD needs splits (timm assert)
    with pytest.raises(SystemExit, match="aug-splits"):
        main(base + ["--aug-splits", "1"])
    with pytest.raises(SystemExit, match="mixup"):
        main(base + ["--aug-splits", "2", "--mixup", "0.8"])


def test_cli_aug_repeats(patch_folder, tmp_path):
    """--aug-repeats (RASampler/DeiT repeated augmentation): repeated
    instances share a source image but get independent augmentation; the
    epoch length is unchanged."""
    from tpuwsi.cli.train import main
    from tpuwsi.io.folder import ImageFolderDataset

    ds = ImageFolderDataset(patch_folder)
    plain = list(ds.batches(4, rng=np.random.default_rng(0)))
    rep = list(ds.batches(4, rng=np.random.default_rng(0), repeats=2))
    assert len(rep) == len(plain)  # epoch length unchanged
    for b in rep:
        imgs = b["images"].reshape(4, -1)
        assert np.array_equal(imgs[0], imgs[1])  # adjacent repeats
        assert np.array_equal(imgs[2], imgs[3])
    # unique coverage per epoch is halved
    n_unique = len({bytes(b["images"][i].tobytes()) for b in rep
                    for i in range(4)})
    assert n_unique <= len(ds) // 2 + 1

    state = main([
        "--data-dir", patch_folder, "--model", "vit_tiny_patch16_224",
        "--img-size", "32", "-b", "8", "--epochs", "1",
        "--max-steps-per-epoch", "1", "--warmup-epochs", "0",
        "--transform_type", "timm", "--output", str(tmp_path / "runs"),
        "--eval_rate", "100", "--val-split", "0", "--aug-repeats", "2",
    ])
    assert int(state.step) == 1


def test_cli_plateau_scheduler_decays_on_stalled_metric(patch_folder, tmp_path):
    """--sched plateau (timm PlateauLRScheduler): when the eval metric
    stalls, the host controller decays the LR scale living in opt_state
    (value surgery, no recompile). Bright-vs-dark folders saturate AUC at
    1.0 after epoch 0, so patience 0 must decay from epoch 1 on."""
    import jax

    from tpuwsi.cli.train import main
    from tpuwsi.train.optim import PlateauScaleState

    state = main([
        "--data-dir", patch_folder, "--model", "vit_tiny_patch16_224",
        "--img-size", "32", "-b", "8", "--epochs", "3",
        "--max-steps-per-epoch", "1", "--warmup-epochs", "0",
        "--transform_type", "timm", "--output", str(tmp_path / "runs"),
        "--eval_rate", "1", "--val-split", "0.25",
        "--sched", "plateau", "--patience-epochs", "0",
        "--decay-rate", "0.5", "--lr", "0.001",
    ])
    scales = [
        s.scale for s in jax.tree_util.tree_leaves(
            state.opt_state,
            is_leaf=lambda x: isinstance(x, PlateauScaleState),
        )
        if isinstance(s, PlateauScaleState)
    ]
    assert len(scales) == 1
    assert float(scales[0]) <= 0.5  # at least one decay fired


def test_timm_train_alias_defaults(patch_folder, tmp_path):
    """cli/timm_train pins timm's own defaults (eval-metric top1, per-epoch
    validation) without overriding explicit flags."""
    from tpuwsi.cli.timm_train import main

    out = str(tmp_path / "runs")
    state = main([
        patch_folder,  # positional data_dir, timm style
        "--model", "vit_tiny_patch16_224",
        "--img-size", "32",
        "-b", "8",
        "--epochs", "1",
        "--max-steps-per-epoch", "1",
        "--warmup-epochs", "0",
        "--transform_type", "flip",
        "--output", out,
    ])
    assert int(state.step) == 1
    import csv
    run_dir = [os.path.join(out, e) for e in os.listdir(out)
               if e.startswith("Exp_")][0]
    rows = list(csv.DictReader(open(os.path.join(run_dir, "summary.csv"))))
    # per-epoch folder validation ran (timm default) → top1 present
    assert "eval_top1" in rows[0]


def test_timm_defaults_precedence():
    """timm defaults must rank BELOW the YAML config and the command line
    (they travel through the parser's defaults layer — injecting them as
    argv would silently override '--config' values and glued/abbreviated
    options, since argparse keeps the LAST occurrence)."""
    from tpuwsi.cli.args import parse_args
    from tpuwsi.cli.timm_train import _TIMM_DEFAULTS, compose_argv

    # unset → timm defaults
    a = parse_args(compose_argv(["data"]), default_overrides=_TIMM_DEFAULTS)
    assert a.batch_size == 128 and a.eval_metric == "top1"
    assert a.transform_type == "timm" and a.data_dir == "data"
    # CLI wins over the defaults, in every spelling
    for spelling in (["-b64"], ["-b", "64"], ["--batch-size=64"]):
        a = parse_args(compose_argv(["data"] + spelling),
                       default_overrides=_TIMM_DEFAULTS)
        assert a.batch_size == 64, spelling
    # abbreviated long option wins too
    a = parse_args(compose_argv(["data", "--eval-met", "auc"]),
                   default_overrides=_TIMM_DEFAULTS)
    assert a.eval_metric == "auc"


def test_timm_defaults_yield_to_config_yaml(tmp_path):
    """--config values must beat the timm defaults (the reference loads YAML
    into parser defaults, then parses — timm_train.py/train.py:396-410)."""
    from tpuwsi.cli.args import parse_args
    from tpuwsi.cli.timm_train import _TIMM_DEFAULTS, compose_argv

    cfg = tmp_path / "c.yaml"
    cfg.write_text("batch_size: 512\neval_rate: 10\n")
    a = parse_args(compose_argv(["data", "--config", str(cfg)]),
                   default_overrides=_TIMM_DEFAULTS)
    assert a.batch_size == 512
    assert a.eval_rate == 10
    # untouched defaults still apply
    assert a.eval_metric == "top1"


def test_pretrained_flag_errors_actionably(tmp_path):
    """--pretrained must fail loudly with the offline-converter pointer
    (PARITY.md non-goals), never silently train from scratch."""
    import pytest as _pytest

    from tpuwsi.cli.train import main

    with _pytest.raises(SystemExit, match="initial-checkpoint"):
        main(["--data-dir", str(tmp_path), "--pretrained", "--epochs", "1",
              "--output", str(tmp_path / "out")])


def test_drop_connect_alias_errors_actionably(tmp_path):
    """--drop-connect (timm's deprecated alias) must refuse loudly with the
    --drop-path pointer, never silently remap (PARITY.md non-goals)."""
    import pytest as _pytest

    from tpuwsi.cli.train import main

    with _pytest.raises(SystemExit, match="drop-path"):
        main(["--data-dir", str(tmp_path), "--drop-connect", "0.2",
              "--epochs", "1", "--output", str(tmp_path / "out")])


def test_pretrained_flag_errors_before_dispatch(tmp_path):
    """The --pretrained guard must fire for the --ssl and survival dispatch
    paths too, before any dataset work (review finding r3)."""
    import pytest as _pytest

    from tpuwsi.cli.train import main

    with _pytest.raises(SystemExit, match="initial-checkpoint"):
        main(["--ssl", "--data-dir", str(tmp_path), "--pretrained",
              "--output", str(tmp_path / "o")])
    with _pytest.raises(SystemExit, match="initial-checkpoint"):
        main(["-tar", "Survival_Time", "--pretrained",
              "--output", str(tmp_path / "o2")])


def test_run_book_command_replay():
    """The exact command lines from the reference run book
    (train_instruct.txt:17-31) must parse and route on the tpuwsi flag
    surface — flag-for-flag parity, not just flag existence."""
    commands = {
        # srun Supervised / SSL (train_instruct.txt:17,18)
        "supervised_srun": "--model vit_small_patch16_224 --dataset TCGA "
        "--epochs 100 --target ER --workers 2 --num-classes 2 --log-wandb "
        "--experiment Supervised --subexperiment 1.0",
        "ssl_srun": "--model vit_small_patch16_224_dino --dataset TCGA "
        "--epochs 100 --target ER --workers 2 --num-classes 2 --log-wandb "
        "--experiment SSl --subexperiment 1.0",
        # Supervised-Baseline (train_instruct.txt:24)
        "baseline": "--model vit_small_patch16_224 --dataset CAT --epochs 500 "
        "--target ER --num-classes 2 --batch-size 256 --workers 2 "
        "--supervised --log-wandb --experiment Supervised --subexperiment 1.1 "
        "--lr-base 0.001 --opt adam --warmup-epochs 20",
        # Supervised-fine-tune-no-grad (train_instruct.txt:27-28)
        "finetune_no_grad": "--model vit_small_patch16_224 --dataset CAT "
        "--epochs 500 --target ER --num-classes 2 --batch-size 256 "
        "--workers 2 --supervised --log-wandb --experiment Supervised "
        "--subexperiment 1.2 --initial-checkpoint /x/model_best.pth.tar "
        "--no-grad --lr-base 0.001 --sched cosine --warmup-epochs 20",
        # old balanced-dataset variant (train_instruct.txt:34)
        "balanced": "--model vit_small_patch16_224_dino --dataset TCGA "
        "--epochs 30 --batch-size 10 --target ER --workers 2 "
        "--num-classes 2 --balanced_dataset --log-wandb "
        "--experiment Supervised --subexperiment 1.0",
    }
    for name, cmd in commands.items():
        a = parse_args(cmd.split())
        assert a.target == "ER" and a.num_classes == 2, name
        assert a.experiment and a.subexperiment, name
    a = parse_args(commands["baseline"].split())
    assert a.supervised and a.lr_base == 0.001 and a.opt == "adam"
    a = parse_args(commands["finetune_no_grad"].split())
    assert a.no_grad and a.initial_checkpoint.endswith("model_best.pth.tar")
    assert a.sched == "cosine" and a.warmup_epochs == 20
    a = parse_args(commands["balanced"].split())
    assert a.balanced_dataset and a.batch_size == 10


def test_subexperiment_nests_output_dir(tmp_path):
    """--subexperiment nests a sub-folder under the run dir, reference
    get_outdir(output, exp_name, subexp_name) semantics (train.py:857-865)."""
    from tpuwsi.utils.ledger import ExperimentLedger

    led = ExperimentLedger(str(tmp_path))
    exp = led.create("ER", test_fold=1, name="Supervised", subname="1.2")
    loc = exp["Location"]
    assert os.path.isdir(loc)
    assert os.path.basename(loc) == "1.2"
    assert "Supervised" in os.path.basename(os.path.dirname(loc))
    # without subname: flat layout unchanged
    exp2 = led.create("ER", test_fold=1, name="Supervised")
    assert os.path.basename(exp2["Location"]).startswith("Exp_")


def test_cli_noaug_inputsize_mixup_off(patch_folder, tmp_path):
    """--no-aug / --input-size / --mixup-off-epoch / elem-mode mixup with
    --cutmix-minmax end-to-end: epoch 0 trains with mixup, epoch 1 switches
    to the no-mix step (timm_train.py:838-844)."""
    from tpuwsi.cli.train import main

    out = str(tmp_path / "runs")
    state = main([
        "--data-dir", patch_folder,
        "--model", "vit_tiny_patch16_224",
        "--input-size", "3", "32", "32",
        "-b", "8",
        "--epochs", "2",
        "--max-steps-per-epoch", "1",
        "--warmup-epochs", "0",
        "--transform_type", "flip",
        "--output", out,
        "--eval_rate", "100",
        "--val-split", "0",
        "--no-aug",
        "--mixup", "0.8",
        "--mixup-mode", "elem",
        "--cutmix-minmax", "0.3", "0.6",
        "--mixup-off-epoch", "1",
    ])
    assert int(state.step) == 2


def test_input_size_geometry_resolution():
    import pytest as _pytest

    from tpuwsi.cli.args import parse_args
    from tpuwsi.cli.train import _resolve_input_geometry

    gray = ["--data-dir", "x", "--transform_type", "timm"]
    a = parse_args(["--input-size", "1", "48", "48"] + gray)
    img, chans = _resolve_input_geometry(a)
    assert img == 48 and chans == 1 and a.img_size == 48
    # --in-chans wins over --input-size's channel dim
    a = parse_args(["--input-size", "1", "48", "48", "--in-chans", "3"])
    assert _resolve_input_geometry(a) == (48, 3)
    # non-RGB requests outside folder+timm mode fail BEFORE dispatch
    with _pytest.raises(SystemExit, match="in-chans"):
        _resolve_input_geometry(parse_args(["--in-chans", "1"]))
    with _pytest.raises(SystemExit, match="in-chans"):
        _resolve_input_geometry(
            parse_args(["--in-chans", "1", "--ssl", "--data-dir", "x",
                        "--transform_type", "timm"])
        )


def test_cli_grayscale_in_chans(patch_folder, tmp_path):
    """--in-chans 1 end-to-end: grayscale loading, channel-adapted
    normalization, 1-channel patch embed (review finding r3)."""
    from tpuwsi.cli.train import main

    state = main([
        "--data-dir", patch_folder,
        "--model", "vit_tiny_patch16_224",
        "--input-size", "1", "32", "32",
        "-b", "8",
        "--epochs", "1",
        "--max-steps-per-epoch", "2",
        "--warmup-epochs", "0",
        "--transform_type", "timm",
        "--output", str(tmp_path / "runs"),
        "--eval_rate", "100",
        "--val-split", "0.25",
    ])
    # 16 imgs - 25% val = 12 train -> one batch of 8 per epoch (drop_last);
    # the per-epoch folder validation runs on the grayscale val split too
    assert int(state.step) == 1


def test_no_resume_opt(patch_folder, tmp_path):
    """--no-resume-opt resumes weights + step but starts a fresh optimizer
    (timm train.py:604-613)."""
    from tpuwsi.cli.train import main

    base = [
        "--data-dir", patch_folder,
        "--model", "vit_tiny_patch16_224",
        "--img-size", "32",
        "-b", "8",
        "--opt", "adamw", "--lr", "1e-3",
        "--epochs", "1",
        "--max-steps-per-epoch", "2",
        "--warmup-epochs", "0",
        "--transform_type", "flip",
        "--eval_rate", "100",
        "--val-split", "0",
    ]
    out1 = str(tmp_path / "r1")
    state = main(base + ["--output", out1])
    assert int(state.step) == 2
    import glob

    ckpt_dir = glob.glob(os.path.join(out1, "*", "checkpoints"))[0]

    def opt_nonzero(st):
        leaves = jax.tree_util.tree_leaves(st.opt_state)
        return any(
            np.asarray(jnp.abs(l)).max() > 0 for l in leaves if l.ndim > 0
        )

    import jax
    import jax.numpy as jnp

    # plain resume: optimizer moments come back non-zero; --no-resume-opt:
    # fresh (all-zero) moments, same params/step. --epochs 1 is already
    # complete, so the loop body never runs and we see the post-resume state.
    s_plain = main(base + ["--output", str(tmp_path / "r2"),
                           "--resume", ckpt_dir])
    assert int(s_plain.step) == 2 and opt_nonzero(s_plain)
    s_fresh = main(base + ["--output", str(tmp_path / "r3"),
                           "--resume", ckpt_dir, "--no-resume-opt"])
    assert int(s_fresh.step) == 2 and not opt_nonzero(s_fresh)
    l1 = jax.tree_util.tree_leaves(s_plain.params)[0]
    l2 = jax.tree_util.tree_leaves(s_fresh.params)[0]
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2))


def test_no_resume_opt_restores_ema(patch_folder, tmp_path):
    """--no-resume-opt still restores the EMA weights (timm resumes
    model_ema separately from the optimizer state)."""
    import jax
    import numpy as np

    from tpuwsi.cli.train import main

    base = [
        "--data-dir", patch_folder,
        "--model", "vit_tiny_patch16_224",
        "--img-size", "32",
        "-b", "8",
        "--opt", "adamw", "--lr", "5e-2",
        "--epochs", "1",
        "--max-steps-per-epoch", "2",
        "--warmup-epochs", "0",
        "--transform_type", "flip",
        "--eval_rate", "100",
        "--val-split", "0",
        "--model-ema", "--model-ema-decay", "0.5",
    ]
    out1 = str(tmp_path / "r1")
    s0 = main(base + ["--output", out1])
    import glob

    ckpt_dir = glob.glob(os.path.join(out1, "*", "checkpoints"))[0]
    s = main(base + ["--output", str(tmp_path / "r2"),
                     "--resume", ckpt_dir, "--no-resume-opt"])
    # EMA came from the checkpoint (lags params), not a fresh copy of params
    pe = jax.tree_util.tree_leaves(s.ema_params)[0]
    pp = jax.tree_util.tree_leaves(s.params)[0]
    assert not np.allclose(np.asarray(pe), np.asarray(pp))
    e0 = jax.tree_util.tree_leaves(s0.ema_params)[0]
    np.testing.assert_allclose(np.asarray(pe), np.asarray(e0))


def test_model_ema_eval_uses_ema_weights(patch_folder, tmp_path):
    """With --model-ema the per-epoch validation scores the EMA copy
    (train.py:947-956 eval_metrics = ema_eval_metrics)."""
    import jax
    import jax.numpy as jnp

    from tpuwsi.cli.train import main

    state = main([
        "--data-dir", patch_folder,
        "--model", "vit_tiny_patch16_224",
        "--img-size", "32",
        "-b", "8",
        "--lr", "5e-2", "--opt", "adamw",
        "--epochs", "1",
        "--max-steps-per-epoch", "1",
        "--warmup-epochs", "0",
        "--transform_type", "flip",
        "--output", str(tmp_path / "runs"),
        "--eval_rate", "100",
        "--val-split", "0.25",
        "--model-ema", "--model-ema-decay", "0.5",
    ])
    # smoke: EMA state exists and lags params (decay 0.5 after 1 big step)
    pe = jax.tree_util.tree_leaves(state.ema_params)[0]
    pp = jax.tree_util.tree_leaves(state.params)[0]
    assert not np.allclose(np.asarray(pe), np.asarray(pp))
    # and the eval step built by the CLI reads the EMA branch
    from tpuwsi.train import make_eval_step

    logged = {}

    def fake_apply(params, images, deterministic=True):
        logged["leaf"] = jax.tree_util.tree_leaves(params)[0]
        return jnp.zeros((images.shape[0], 2))

    es = make_eval_step(fake_apply, use_ema=True)
    es(state, {"images": jnp.zeros((2, 32, 32, 3), jnp.uint8)})
    np.testing.assert_allclose(
        np.asarray(logged["leaf"]), np.asarray(pe)
    )


def test_cli_multi_target_rejects_mixup(wsi_cohort, tmp_path):
    """Mixup one-hots (B,) labels; multi-target (B, T) matrices must be
    rejected loudly (review finding r3-s3)."""
    from tpuwsi.cli.train import main

    with pytest.raises(SystemExit, match="single-label"):
        main([
            "--dataset", "TCGA", "--data-root", wsi_cohort,
            "--model", "vit_tiny_patch16_224", "--tile-size", "32",
            "-b", "4", "--epochs", "1", "--output", str(tmp_path / "r"),
            "-tar", "ER+Her2", "--mixup", "0.2",
        ])


def test_cli_multi_target_end_to_end(wsi_cohort, tmp_path):
    """-tar ER+Her2 (datasets.py:55-61): T independent 2-class heads, masked
    per-head CE, per-target slide AUCs in the eval metrics."""
    from tpuwsi.cli.train import main

    out = str(tmp_path / "runs")
    state = main([
        "--dataset", "TCGA",
        "--data-root", wsi_cohort,
        "--model", "vit_tiny_patch16_224",
        "-tar", "ER+Her2",
        "--tile-size", "32",
        "-b", "4",
        "--epochs", "1",
        "--max-steps-per-epoch", "2",
        "--warmup-epochs", "0",
        "--opt", "adamw",
        "--lr", "1e-3",
        "--transform_type", "flip",
        "--output", out,
        "--eval_rate", "1",
        "--n_patches_test", "4",
        "-tpi", "4",
        "-tf", "1",
    ])
    assert int(state.step) == 2
    run_dir = [os.path.join(out, e) for e in os.listdir(out)
               if e.startswith("Exp_")][0]
    import csv

    rows = list(csv.DictReader(open(os.path.join(run_dir, "summary.csv"))))
    assert "eval_auc_ER" in rows[0] and "eval_auc_Her2" in rows[0]
    assert "eval_auc" in rows[0]


def test_cli_trains_resnet50_with_batchnorm(tmp_path):
    """create_model('resnet50') end-to-end: the BN running statistics ride
    TrainState.batch_stats, update during training (mutable apply), and the
    eval path consumes them (round-3 VERDICT #7; reference surface:
    create_model(args.model) at train.py:482-495 with a CNN name)."""
    import numpy as np
    from PIL import Image

    from tpuwsi.cli.train import main

    rng = np.random.default_rng(0)
    for cls, base in (("neg", 40), ("pos", 200)):
        os.makedirs(tmp_path / "data" / cls)
        for i in range(8):
            arr = np.clip(rng.normal(base, 20, (32, 32, 3)), 0, 255)
            Image.fromarray(arr.astype(np.uint8)).save(
                tmp_path / "data" / cls / f"{i}.png")
    state = main([
        "--data-dir", str(tmp_path / "data"),
        "--model", "resnet50",
        "--img-size", "32",
        "-b", "4",
        "--epochs", "1",
        "--max-steps-per-epoch", "2",
        "--warmup-epochs", "0",
        "--opt", "sgd",
        "--lr", "1e-2",
        "--transform_type", "flip",
        "--output", str(tmp_path / "runs"),
        "--eval_rate", "1",
        "--val-split", "0.25",
    ])
    assert int(state.step) == 2
    assert state.batch_stats is not None
    # BN running stats actually moved off their init (mean 0 / var 1)
    import jax

    means = [np.asarray(x) for x in jax.tree_util.tree_leaves(
        state.batch_stats) if x.ndim == 1]
    assert any(np.abs(m).max() > 1e-4 for m in means)


def test_cli_trains_efficientnet_b0(tmp_path):
    """create_model('efficientnet_b0') end-to-end through the shared CLI
    loop: MBConv/SE/SiLU backbone, BN stats on TrainState.batch_stats,
    per-block stochastic depth riding the step's dropout rng (reference
    surface: create_model(args.model) at train.py:482-495 /
    timm_train.py:357 with timm's flagship CNN family)."""
    import numpy as np
    from PIL import Image

    from tpuwsi.cli.train import main

    rng = np.random.default_rng(0)
    for cls, base in (("neg", 40), ("pos", 200)):
        os.makedirs(tmp_path / "data" / cls)
        for i in range(8):
            arr = np.clip(rng.normal(base, 20, (32, 32, 3)), 0, 255)
            Image.fromarray(arr.astype(np.uint8)).save(
                tmp_path / "data" / cls / f"{i}.png")
    state = main([
        "--data-dir", str(tmp_path / "data"),
        "--model", "efficientnet_b0",
        "--drop-path", "0.1",
        "--img-size", "32",
        "-b", "4",
        "--epochs", "1",
        "--max-steps-per-epoch", "2",
        "--warmup-epochs", "0",
        "--opt", "sgd",
        "--lr", "1e-2",
        "--transform_type", "flip",
        "--output", str(tmp_path / "runs"),
        "--eval_rate", "1",
        "--val-split", "0.25",
    ])
    assert int(state.step) == 2
    assert state.batch_stats is not None
    import jax

    means = [np.asarray(x) for x in jax.tree_util.tree_leaves(
        state.batch_stats) if x.ndim == 1]
    assert any(np.abs(m).max() > 1e-4 for m in means)


def test_export_torch_cli_roundtrip(tmp_path):
    """cli.export_torch: an SSL (DINOState) checkpoint exports its teacher
    backbone to a timm-named .pth that torch loads and the golden importer
    maps back to the exact flax tree (the reverse of the reference's
    create_model+load_state_dict consumption, train.py:482-520)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    import torch

    from tpuwsi.cli.export_torch import main as export_main
    from tpuwsi.models import DINOHead
    from tpuwsi.models.convert import torch_vit_to_flax
    from tpuwsi.models.vit import ViTConfig, VisionTransformer
    from tpuwsi.ssl_dino.dino import DINOConfig, DINOModel, create_dino_state
    from tpuwsi.train.checkpoint import CheckpointManager

    cfg = ViTConfig(img_size=32, patch_size=16, embed_dim=64, depth=2,
                    num_heads=2, num_classes=0, dtype=jnp.float32)
    model = DINOModel(backbone=VisionTransformer(cfg),
                      head=DINOHead(out_dim=128, gelu_approx=True))
    params = model.init(jax.random.PRNGKey(1),
                        jnp.zeros((1, 32, 32, 3), jnp.float32))
    tx = optax.sgd(1e-2)
    state = create_dino_state(params, tx, DINOConfig(out_dim=128))
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(0, state, {"loss": 1.0})
    mgr.wait()
    mgr.close()

    out = str(tmp_path / "teacher.pth")
    sd = export_main(["--checkpoint", str(tmp_path / "ckpt"),
                      "--output", out])
    loaded = torch.load(out, map_location="cpu", weights_only=True)
    assert loaded["patch_embed.proj.weight"].shape == (64, 3, 16, 16)
    assert set(loaded) == set(sd)

    # importer maps the exported dict back onto the exact teacher backbone
    backbone = VisionTransformer(cfg)
    target = backbone.init(jax.random.PRNGKey(2),
                           jnp.zeros((1, 32, 32, 3), jnp.float32))
    v1 = torch_vit_to_flax(loaded, target)
    import flax

    want = flax.traverse_util.flatten_dict(
        flax.core.unfreeze({"params": params["params"]["backbone"]}))
    got = flax.traverse_util.flatten_dict(flax.core.unfreeze(v1))
    for k in want:
        np.testing.assert_array_equal(
            np.asarray(want[k]), np.asarray(got[k]), err_msg=str(k))


def test_export_torch_cli_resnet(tmp_path):
    """cli.export_torch on a supervised resnet checkpoint: picks the
    torchvision exporter, carries BN running stats, loads strict into a
    torchvision-geometry model."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    import torch

    from tpuwsi.cli.export_torch import main as export_main
    from tpuwsi.models.registry import create_model
    from tpuwsi.train.checkpoint import CheckpointManager
    from tpuwsi.train.state import create_train_state

    model = create_model("resnet18", num_classes=2, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3), jnp.float32))
    state = create_train_state(
        {"params": variables["params"]}, optax.sgd(1e-2),
        batch_stats=variables["batch_stats"])
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(0, state, {"loss": 1.0})
    mgr.wait()
    mgr.close()

    out = str(tmp_path / "resnet18.pth")
    sd = export_main(["--checkpoint", str(tmp_path / "ckpt"),
                      "--output", out])
    loaded = torch.load(out, map_location="cpu", weights_only=True)
    assert loaded["conv1.weight"].shape[1] == 3
    assert "layer4.1.bn2.running_var" in loaded
    assert set(loaded) == set(sd)
    from tests.test_convert import _TorchResNet18

    tmodel = _TorchResNet18(num_classes=2)
    tmodel.load_state_dict(loaded, strict=True)


def test_model_parallel_rejects_cnn_models(tmp_path):
    """--model-parallel with a CNN must refuse loudly: the TP rules cover
    the ViT GEMMs only; a CNN tree would silently replicate over the model
    axis and waste every model-parallel chip."""
    import pytest as _pytest

    from tpuwsi.cli.train import main

    with _pytest.raises(SystemExit, match="data-parallel"):
        main(["--data-dir", str(tmp_path), "--model", "resnet50",
              "--model-parallel", "2", "--epochs", "1",
              "--output", str(tmp_path / "out")])
