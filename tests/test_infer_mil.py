import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest
from PIL import Image

from tpuwsi.infer import SlideAggregator, SlideWalker, roc_auc
from tpuwsi.io import grid_data_columns, grid_file_path, save_grid_pickle
from tpuwsi.io.metadata import load_slide_table
from tpuwsi.mil import (
    CombinedFeaturesMILDataset,
    FeatureLocator,
    FeaturesMILDataset,
    train_mil_head,
)
from tpuwsi.utils.minixlsx import write_xlsx


@pytest.fixture
def cohort(tmp_path):
    root = tmp_path / "Breast" / "TCGA"
    os.makedirs(root / "Grids_10")
    rng = np.random.default_rng(0)
    files, folds, targets, counts = [], [], [], []
    for i in range(4):
        name = f"s{i}.png"
        # class signal: positives brighter
        base = 180 if i % 2 == 0 else 60
        arr = np.clip(rng.normal(base, 30, (512, 512, 3)), 0, 255).astype(np.uint8)
        Image.fromarray(arr).save(root / name)
        grid = [(r, c) for r in range(0, 384, 128) for c in range(0, 384, 128)]
        save_grid_pickle(str(grid_file_path(str(root), name, 10, 128)), grid)
        files.append(name)
        folds.append(1)
        targets.append("Positive" if i % 2 == 0 else "Negative")
        counts.append(len(grid))
    total_col, legit_col = grid_data_columns(128, 10)
    write_xlsx(
        str(root / "slides_data_TCGA.xlsx"),
        pd.DataFrame({
            "file": files, "id": ["TCGA"] * 4,
            "patient barcode": [f"P{i}" for i in range(4)],
            "ER status": targets, "test fold idx": folds,
            "Manipulated Objective Power": [10] * 4, "DX": [True] * 4,
        }),
    )
    write_xlsx(
        str(root / "Grids_10" / "Grid_data.xlsx"),
        pd.DataFrame({"file": files, total_col: counts, legit_col: counts}),
    )
    return tmp_path


def test_slide_walker_chunks_and_masks(cohort):
    table = load_slide_table(
        "TCGA", tile_size=128, target_kind="ER", train_type="Infer",
        infer_folds=[1], data_root=str(cohort),
    )
    walker = SlideWalker(table, tiles_per_iter=4, num_tiles=6)
    chunks = list(walker.walk())
    # 4 slides × ceil(6/4)=2 chunks
    assert len(chunks) == 8
    assert len(walker) == 8
    first, second = chunks[0], chunks[1]
    assert first.images.shape == (4, 128, 128, 3)
    assert first.mask.all() and not first.is_last_batch
    assert second.mask.sum() == 2 and second.is_last_batch  # padded chunk
    assert (second.images[2:] == 0).all()


def test_aggregator_and_feature_roundtrip(cohort, tmp_path):
    table = load_slide_table(
        "TCGA", tile_size=128, target_kind="ER", train_type="Infer",
        infer_folds=[1], data_root=str(cohort),
    )
    walker = SlideWalker(table, tiles_per_iter=4, num_tiles=6)
    agg = SlideAggregator(extract_features=True)
    for chunk in walker.walk():
        # fake "model": class-1 prob = mean brightness; features = 8-dim
        bright = chunk.images.astype(np.float32).mean(axis=(1, 2, 3)) / 255.0
        probs = np.stack([1 - bright, bright], axis=1)
        feats = np.tile(bright[:, None], (1, 8)).astype(np.float32)
        agg.add_chunk(chunk, probs, feats)

    assert len(agg.results) == 4
    assert agg.slide_auc() == 1.0  # positives are brighter by construction
    assert agg.patch_auc() > 0.9
    # every slide got exactly 6 valid tiles
    assert all(len(r.tile_probs) == 6 for r in agg.results)

    # reference 8-tuple export → FeaturesMILdataset reads it back
    data_file = str(tmp_path / "inference" / "test.data")
    agg.save_inference_data(data_file)
    with open(data_file, "rb") as f:
        tup = pickle.load(f)
    assert len(tup) == 8
    labels, targets, scores, patch_scores, names, feats, bn, locs = tup
    assert feats.shape == (4, 1, 6, 8)

    ds = FeaturesMILDataset(
        data_file, bag_size=4, minimum_tiles_in_slide=2, is_train=True
    )
    assert len(ds) == 4
    bag, target, tscores, name = ds.sample_bag(0, np.random.default_rng(0))
    assert bag.shape == (4, 8)

    batches = list(ds.bags(np.random.default_rng(0), batch_size=2))
    assert batches[0]["features"].shape == (2, 4, 8)
    assert batches[0]["mask"].all()


def test_mil_bag_with_replacement_when_few_tiles(tmp_path):
    # one slide with only 3 tiles, bag_size 8 → sampling WITH replacement
    feats = np.full((1, 1, 3, 4), 0.5, np.float32)
    pscores = np.ones((1, 3), np.float32)
    data = (np.array([1]), np.array([1]), np.array([0.7]), pscores,
            ["s.mrxs"], feats)
    p = str(tmp_path / "x.data")
    with open(p, "wb") as f:
        pickle.dump(data, f)
    ds = FeaturesMILDataset(p, bag_size=8, minimum_tiles_in_slide=1)
    bag, *_ = ds.sample_bag(0, np.random.default_rng(0))
    assert bag.shape == (8, 4)


def test_mil_per_patient_inconsistent_target_rejected(tmp_path):
    # two TCGA slides, same patient, different targets → patient rejected
    feats = np.random.rand(2, 1, 5, 4).astype(np.float32)
    pscores = np.ones((2, 5), np.float32)
    names = ["TCGA-AB-1234-01.svs", "TCGA-AB-1234-02.svs"]
    data = (np.array([1, 0]), np.array([1, 0]), np.array([0.7, 0.3]),
            pscores, names, feats)
    p = str(tmp_path / "x.data")
    with open(p, "wb") as f:
        pickle.dump(data, f)
    ds = FeaturesMILDataset(p, bag_size=2, minimum_tiles_in_slide=1,
                            is_per_patient=True)
    assert len(ds) == 0
    assert "TCGA-AB-1234" in ds.bad_patient_list


def test_mil_ndpi_rename_and_carmel_only(tmp_path):
    feats = np.random.rand(2, 1, 5, 4).astype(np.float32)
    pscores = np.ones((2, 5), np.float32)
    names = ["a.ndpi", "b.mrxs"]
    data = (np.array([1, 0]), np.array([1, 0]), np.array([0.7, 0.3]),
            pscores, names, feats)
    p = str(tmp_path / "x.data")
    with open(p, "wb") as f:
        pickle.dump(data, f)
    ds = FeaturesMILDataset(p, bag_size=2, minimum_tiles_in_slide=1)
    assert "a.tif" in ds.slide_names  # .ndpi → .tif (datasets.py:1070-1072)
    ds2 = FeaturesMILDataset(p, bag_size=2, minimum_tiles_in_slide=1,
                             carmel_only=True)
    assert ds2.slide_names == ["b.mrxs"]


def test_mil_head_trains_to_separate(tmp_path):
    # 16 synthetic "slides": positives have a shifted feature cluster
    rng = np.random.default_rng(0)
    n, tiles, dim = 16, 12, 8
    feats = rng.normal(0, 1, (n, 1, tiles, dim)).astype(np.float32)
    targets = np.arange(n) % 2
    feats[targets == 1, :, :, :2] += 2.0
    data = (targets, targets, targets.astype(float),
            np.ones((n, tiles), np.float32),
            [f"s{i}.svs" for i in range(n)], feats)
    p = str(tmp_path / "x.data")
    with open(p, "wb") as f:
        pickle.dump(data, f)
    ds = FeaturesMILDataset(p, bag_size=8, minimum_tiles_in_slide=1,
                            is_train=True)
    logs = []
    model, state = train_mil_head(
        ds, epochs=30, batch_size=8, lr=3e-3,
        log_fn=lambda e, m: logs.append(m),
    )
    assert logs[-1]["auc"] == 1.0
    assert logs[-1]["loss"] < logs[0]["loss"]


def test_mil_scanned_dispatch_matches_per_step(tmp_path):
    """steps_per_dispatch scans k optimizer steps per dispatch with
    identical semantics: same batch order, same RNG draws — the final
    params and eval metrics must match the per-step run exactly.
    n=16 slides at batch 6 → 2 full batches + a ragged 4-bag tail, so
    the scan path, the leftover-buffer path, and the per-call tail are
    all exercised."""
    rng = np.random.default_rng(0)
    n, tiles, dim = 16, 12, 8
    feats = rng.normal(0, 1, (n, 1, tiles, dim)).astype(np.float32)
    targets = np.arange(n) % 2
    feats[targets == 1, :, :, :2] += 2.0
    data = (targets, targets, targets.astype(float),
            np.ones((n, tiles), np.float32),
            [f"s{i}.svs" for i in range(n)], feats)
    p = str(tmp_path / "x.data")
    with open(p, "wb") as f:
        pickle.dump(data, f)

    def run(k):
        ds = FeaturesMILDataset(p, bag_size=8, minimum_tiles_in_slide=1,
                                is_train=True)
        ev = FeaturesMILDataset(p, bag_size=8, minimum_tiles_in_slide=1,
                                is_train=False)
        logs = []
        _, state = train_mil_head(
            ds, epochs=4, batch_size=6, lr=3e-3, seed=0,
            eval_dataset=ev, steps_per_dispatch=k,
            log_fn=lambda e, m: logs.append(m),
        )
        return state, logs

    s1, l1 = run(1)
    s2, l2 = run(2)
    import jax

    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    assert l1[-1]["eval_auc"] == l2[-1]["eval_auc"]


def test_combined_dataset_joins_on_common_keys(tmp_path):
    def make(names, targets, path):
        feats = np.random.rand(len(names), 1, 5, 4).astype(np.float32)
        data = (np.array(targets), np.array(targets),
                np.array(targets, float), np.ones((len(names), 5), np.float32),
                names, feats)
        with open(path, "wb") as f:
            pickle.dump(data, f)

    p1, p2 = str(tmp_path / "a.data"), str(tmp_path / "b.data")
    make(["x.svs", "y.svs", "z.svs"], [1, 0, 1], p1)
    make(["y.svs", "z.svs", "w.svs"], [0, 1, 0], p2)
    d1 = FeaturesMILDataset(p1, bag_size=3, minimum_tiles_in_slide=1)
    d2 = FeaturesMILDataset(p2, bag_size=3, minimum_tiles_in_slide=1)
    combo = CombinedFeaturesMILDataset({"CAT": d1, "CARMEL": d2}, bag_size=3)
    assert combo.keys == ["y.svs", "z.svs"]
    batch = next(combo.bags(np.random.default_rng(0), batch_size=2))
    assert batch["CAT"].shape == (2, 3, 4)
    assert batch["CARMEL"].shape == (2, 3, 4)


def test_feature_locator_registry(tmp_path):
    loc = FeatureLocator(registry={})
    loc.register("CAT", "ER", 1, {
        "TrainSet Location": {"train": "/f/train", "test": "/f/test"},
        "REG Model Location": "/ckpt/model",
    })
    fdir, ckpt, name, target = loc.dataset_properties_to_location(
        "CAT", "ER", 1, is_train=True
    )
    assert fdir == "/f/train" and ckpt == "/ckpt/model"
    with pytest.raises(KeyError):
        loc.dataset_properties_to_location("CAT", "Her2", 1)


def test_roc_auc_host():
    assert roc_auc([0.9, 0.8, 0.2, 0.1], [1, 1, 0, 0]) == 1.0
    assert roc_auc([0.1, 0.2, 0.8, 0.9], [1, 1, 0, 0]) == 0.0
    assert abs(roc_auc([0.5, 0.5, 0.5, 0.5], [1, 1, 0, 0]) - 0.5) < 1e-9
    assert roc_auc([1.0], [1]) == 0.5  # single class → 0.5


def _paired_fixture(tmp_path, n_slides=3, n_tiles=6, dim=8, with_locs=True,
                    tumor_offset=100.0):
    """Write matching Receptor and is_Tumor .data dirs (8-tuple layout) with
    identical tile locations; tumor features = receptor + offset so the
    concat order is checkable."""
    rng = np.random.default_rng(0)
    names = [f"s{i}.mrxs" for i in range(n_slides)]
    feats = rng.random((n_slides, 1, n_tiles, dim)).astype(np.float32)
    pscores = np.ones((n_slides, n_tiles), np.float32)
    locs = np.stack(
        [np.stack([np.arange(n_tiles) * 10, np.arange(n_tiles) * 7], axis=1)
         for _ in range(n_slides)]
    ).astype(float)
    labels = np.arange(n_slides) % 2
    base = (labels, labels, np.linspace(0, 1, n_slides), pscores, names)
    rdir, tdir = tmp_path / "receptor", tmp_path / "tumor"
    os.makedirs(rdir), os.makedirs(tdir)
    if with_locs:
        rdata = base + (feats, np.zeros(n_slides), locs)
        tdata = base + (feats + tumor_offset, np.zeros(n_slides), locs)
    else:
        rdata = base + (feats,)
        tdata = base + (feats + tumor_offset,)
    with open(rdir / "a.data", "wb") as f:
        pickle.dump(rdata, f)
    with open(tdir / "a.data", "wb") as f:
        pickle.dump(tdata, f)
    return str(rdir), str(tdir)


def test_paired_receptor_is_tumor_bags(tmp_path):
    """VERDICT r2 #6 (datasets.py:876-882, 1229-1399): a TUPLE data_location
    loads both feature sets, enforces tile-location alignment, and bags carry
    per-tile [receptor | is_Tumor] 2x512-style concatenation; the score
    readout slices the receptor half back out."""
    rdir, tdir = _paired_fixture(tmp_path, dim=8)
    ds = FeaturesMILDataset((rdir, tdir), bag_size=4, minimum_tiles_in_slide=2)
    assert ds.paired_is_tumor
    bag, target, tscores, name = ds.sample_bag(0, np.random.default_rng(0))
    assert bag.shape == (4, 16)  # 8 receptor + 8 tumor dims per tile
    # concat order: second half = first half + offset (tumor = receptor+100)
    np.testing.assert_allclose(bag[:, 8:], bag[:, :8] + 100.0, rtol=1e-5)

    batches = list(ds.bags(np.random.default_rng(0), batch_size=2))
    assert batches[0]["features"].shape == (2, 4, 16)

    # score readout: receptor_slice uses only the first half
    from tpuwsi.models.mil import tile_scores_from_head

    w = np.zeros((16, 2), np.float32)
    w[:8, 1] = 1.0  # head reads receptor dims only
    scores_full = tile_scores_from_head(bag, w, receptor_slice=8)
    expected = bag[:, :8] @ (w[:8, 1] - w[:8, 0])
    np.testing.assert_allclose(np.asarray(scores_full), expected, rtol=1e-5)


def test_paired_per_patient_bags(tmp_path):
    rdir, tdir = _paired_fixture(tmp_path)
    ds = FeaturesMILDataset((rdir, tdir), bag_size=4, minimum_tiles_in_slide=2,
                            is_per_patient=True)
    assert len(ds) == 3  # mrxs base names → one patient per slide
    bag, *_ = ds.sample_bag(0, np.random.default_rng(0))
    assert bag.shape == (4, 16)
    np.testing.assert_allclose(bag[:, 8:], bag[:, :8] + 100.0, rtol=1e-5)


def test_paired_misaligned_locations_rejected(tmp_path):
    rdir, tdir = _paired_fixture(tmp_path)
    # corrupt the tumor set's locations
    import glob as _glob

    tfile = _glob.glob(os.path.join(tdir, "*.data"))[0]
    with open(tfile, "rb") as f:
        data = list(pickle.load(f))
    data[7] = data[7] + 1.0  # shift all locations
    with open(tfile, "wb") as f:
        pickle.dump(tuple(data), f)
    with pytest.raises(ValueError, match="tile locations"):
        FeaturesMILDataset((rdir, tdir), bag_size=4, minimum_tiles_in_slide=2)


def test_paired_missing_slide_rejected(tmp_path):
    rdir, tdir = _paired_fixture(tmp_path)
    import glob as _glob

    tfile = _glob.glob(os.path.join(tdir, "*.data"))[0]
    with open(tfile, "rb") as f:
        data = list(pickle.load(f))
    data[4] = ["other1.mrxs", "other2.mrxs", "other3.mrxs"]
    with open(tfile, "wb") as f:
        pickle.dump(tuple(data), f)
    with pytest.raises(KeyError, match="missing from the is_Tumor"):
        FeaturesMILDataset((rdir, tdir), bag_size=4, minimum_tiles_in_slide=2)


def test_locator_paired_locations(tmp_path):
    from tpuwsi.mil.locator import FeatureLocator

    loc = FeatureLocator(registry={
        "CAT": {"ER": {"1": {
            "TrainSet Location": {"train": "/r/train", "test": "/r/test"},
            "REG Model Location": "/ckpt",
            "is_Tumor": {"TrainSet Location": {"train": "/t/train",
                                               "test": "/t/test"}},
        }}}
    })
    pair = loc.paired_locations("CAT", "ER", 1, is_train=True)
    assert pair == ("/r/train", "/t/train")


def test_paired_with_fixed_tile_num(tmp_path):
    """Regression: receptor tile_locations are stored UNTRUNCATED — the
    is_Tumor alignment check must compare only the first fixed_tile_num
    rows instead of raising a spurious shape mismatch."""
    rdir, tdir = _paired_fixture(tmp_path, n_tiles=6)
    ds = FeaturesMILDataset((rdir, tdir), bag_size=2,
                            minimum_tiles_in_slide=2, fixed_tile_num=4)
    bag, *_ = ds.sample_bag(0, np.random.default_rng(0))
    assert bag.shape == (2, 16)
    np.testing.assert_allclose(bag[:, 8:], bag[:, :8] + 100.0, rtol=1e-5)
