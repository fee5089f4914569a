import os
import pickle

import numpy as np
import pandas as pd
import pytest
from PIL import Image

from tpuwsi.io import (
    ImageFolderDataset,
    ImageSlideReader,
    SyntheticSlideReader,
    WSITileSampler,
    build_tissue_grid,
    choose_data,
    get_dataset_batch_num,
    get_dataset_group,
    get_datasets_dir_dict,
    get_optimal_slide_level,
    grid_data_columns,
    grid_file_path,
    load_grid_packed,
    load_slide_table,
    save_grid_packed,
    save_grid_pickle,
)
from tpuwsi.io.cohorts import DatasetGroup
from tpuwsi.utils.labels import assert_dataset_target, cohort_to_int, get_label


# ---------------------------------------------------------------------------
# levels math (utils.py:37-61 corner cases, SURVEY §4)
# ---------------------------------------------------------------------------


def test_level_exact_match():
    # mag 40 → desired 10: downsample 4 exactly at level 2
    lvl, adj, lvl0 = get_optimal_slide_level([1.0, 2.0, 4.0, 8.0], 40, 10, 256)
    assert (lvl, adj, lvl0) == (2, 256, 1024)


def test_level_between_levels():
    # desired downsample 4 but levels are 1, 3, 9 → best lower level 1 (ds=3),
    # residual 4/3, adjusted = int(256 * 4/3) = 341
    lvl, adj, lvl0 = get_optimal_slide_level([1.0, 3.0, 9.0], 40, 10, 256)
    assert lvl == 1
    assert adj == int(256 * (4 / 3))
    assert lvl0 == 1024


def test_level_upsample_branch():
    # mag 5 → desired 10: desired_downsample 0.5 < 1 → level 0, shrunken tile
    lvl, adj, lvl0 = get_optimal_slide_level([1.0, 2.0], 5, 10, 256)
    assert (lvl, adj, lvl0) == (0, 128, 128)


def test_level_tolerance_match():
    # downsample 4.001 within rel_tol 1e-3 of 4
    lvl, adj, _ = get_optimal_slide_level([1.0, 4.001], 40, 10, 256)
    assert lvl == 1 and adj == 256


# ---------------------------------------------------------------------------
# cohorts registry
# ---------------------------------------------------------------------------


def test_cat_composition():
    d = get_datasets_dir_dict("CAT", data_root="/data")
    assert set(d) == {f"CARMEL{i}" for i in range(1, 9)} | {"TCGA", "ABCTB"}
    assert d["CARMEL3"].endswith("Batch_3/CARMEL3")
    assert "1-8" in d["CARMEL3"] and "9-11" not in d["CARMEL3"]


def test_carmel_9_11_shelf():
    d = get_datasets_dir_dict("CARMEL10", data_root="/data")
    assert "9-11" in d["CARMEL10"]


def test_sheba_batches():
    d = get_datasets_dir_dict("SHEBA", data_root="/data")
    assert set(d) == {f"SHEBA{i}" for i in range(2, 7)}


def test_group_parsing():
    assert get_dataset_group("CARMEL3") == DatasetGroup.CARMEL
    assert get_dataset_group("TCGA_LUNG") == DatasetGroup.TCGA_LUNG
    assert get_dataset_batch_num("CARMEL11") == "11"
    assert get_dataset_batch_num("TCGA") == ""


def test_assert_dataset_target():
    assert_dataset_target("TCGA", "ER")
    assert_dataset_target("CAT", "ER+PR".split("+"))
    with pytest.raises(ValueError):
        assert_dataset_target("TCGA", "Onco")
    with pytest.raises(ValueError):
        assert_dataset_target("SHEBA", "ER")


def test_get_label_parity():
    assert get_label("Positive") == [1]
    assert get_label("Negative") == [0]
    assert get_label(3) == [3]
    assert get_label("7") == [7]
    assert get_label("Missing Data") == [-1]
    assert get_label(float("nan")) == [-1]
    assert get_label(("Positive", "Negative"), multi_target=True) == [1, 0]
    assert cohort_to_int(["TCGA", "CARMEL5", "ABCTB"]) == [2, 1, 0]


# ---------------------------------------------------------------------------
# tiles + readers
# ---------------------------------------------------------------------------


def test_synthetic_reader_and_choose_data():
    reader = SyntheticSlideReader(2048, 2048, levels=3)
    grid = [(r, c) for r in range(0, 1536, 512) for c in range(0, 1536, 512)]
    rng = np.random.default_rng(0)
    tiles, locs = choose_data(
        reader, grid, how_many=4, magnification=40, tile_size=128,
        desired_mag=10, rng=rng, random_shift=True,
    )
    assert tiles.shape == (4, 128, 128, 3)
    assert tiles.dtype == np.uint8
    assert len(locs) == 4 and len(set(locs)) == 4  # without replacement


def test_choose_data_requests_too_many():
    reader = SyntheticSlideReader(1024, 1024)
    with pytest.raises(ValueError):
        choose_data(reader, [(0, 0)], how_many=2, magnification=10,
                    tile_size=64, desired_mag=10)


def test_shift_clamping_stays_in_bounds():
    from tpuwsi.io.tiles import shifted_origin

    rng = np.random.default_rng(0)
    dims = (1000, 800)  # (w, h)
    for loc in [(0, 0), (744, 936), (400, 500)]:
        for _ in range(50):
            top, left = shifted_origin(rng, loc, 64, dims, random_shift=True)
            assert 0 <= top <= dims[1] - 64
            assert 0 <= left <= dims[0] - 64


def test_blank_fallback_counted():
    class FailingReader(SyntheticSlideReader):
        def read_region(self, location, level, size):
            raise IOError("boom")

    from tpuwsi.io.tiles import TileStats, get_tiles

    stats = TileStats()
    reader = FailingReader(512, 512)
    tiles = get_tiles(reader, [(0, 0)], 64, 64, 64, 0, stats=stats)
    assert stats.read_failures == 1
    assert (tiles == 0).all()


def test_grid_packed_roundtrip(tmp_path):
    grid = [(0, 0), (256, 512), (1024, 768)]
    p = str(tmp_path / "x.grid")
    save_grid_packed(p, grid)
    arr = load_grid_packed(p)
    np.testing.assert_array_equal(arr, np.asarray(grid))


def test_build_tissue_grid_detects_tissue():
    # synthetic "slide": white background with a dark tissue block
    arr = np.full((1024, 1024, 3), 255, dtype=np.uint8)
    arr[256:768, 256:768] = 120
    reader = ImageSlideReader(arr)
    grid = build_tissue_grid(reader, 256, tissue_threshold=0.5,
                             preview_downsample=4)
    assert (256, 256) in grid and (512, 512) in grid
    assert (0, 0) not in grid


# ---------------------------------------------------------------------------
# metadata + WSI sampler end-to-end on a synthetic cohort
# ---------------------------------------------------------------------------


@pytest.fixture
def synthetic_cohort(tmp_path):
    """A fake TCGA cohort: slides_data_TCGA.xlsx + Grids_10 + png slides."""
    root = tmp_path / "Breast" / "TCGA"
    os.makedirs(root / "Grids_10")
    rng = np.random.default_rng(0)
    files, folds, targets, tiles_counts = [], [], [], []
    for i in range(6):
        name = f"slide_{i}.png"
        arr = rng.integers(0, 255, (640, 640, 3), dtype=np.uint8)
        Image.fromarray(arr).save(root / name)
        grid = [(r, c) for r in range(0, 512, 128) for c in range(0, 512, 128)]
        save_grid_pickle(str(grid_file_path(str(root), name, 10, 128)), grid)
        files.append(name)
        folds.append(1 if i < 2 else 2)
        targets.append("Positive" if i % 2 == 0 else "Negative")
        tiles_counts.append(len(grid))
    total_col, legit_col = grid_data_columns(128, 10)
    from tpuwsi.utils.minixlsx import write_xlsx

    write_xlsx(
        str(root / "slides_data_TCGA.xlsx"),
        pd.DataFrame(
            {
                "file": files,
                "id": ["TCGA"] * 6,
                "patient barcode": [f"P{i}" for i in range(6)],
                "ER status": targets,
                "test fold idx": folds,
                "Manipulated Objective Power": [10] * 6,
                "DX": [True] * 6,
            }
        ),
    )
    write_xlsx(
        str(root / "Grids_10" / "Grid_data.xlsx"),
        pd.DataFrame(
            {"file": files, total_col: tiles_counts, legit_col: tiles_counts}
        ),
    )
    return tmp_path


def test_slide_table_fold_split(synthetic_cohort):
    table_train = load_slide_table(
        "TCGA", tile_size=128, target_kind="ER", test_fold=1, train=True,
        train_type="REG", n_tiles=4, data_root=str(synthetic_cohort),
    )
    table_test = load_slide_table(
        "TCGA", tile_size=128, target_kind="ER", test_fold=1, train=False,
        train_type="REG", n_tiles=4, data_root=str(synthetic_cohort),
    )
    assert len(table_train) == 4  # folds != 1
    assert len(table_test) == 2  # fold 1
    assert set(table_train.labels().ravel()) <= {0, 1}


def test_wsi_sampler_batches(synthetic_cohort):
    table = load_slide_table(
        "TCGA", tile_size=128, target_kind="ER", test_fold=1, train=True,
        train_type="REG", n_tiles=4, data_root=str(synthetic_cohort),
    )
    sampler = WSITileSampler(table, n_tiles=4, bag_size=1)
    assert len(sampler) == 16  # 4 slides × factor 4 (virtual epoch)
    rng = np.random.default_rng(0)
    batches = list(sampler.batches(rng, batch_size=8))
    assert len(batches) == 2
    b = batches[0]
    assert b["images"].shape == (8, 128, 128, 3)
    assert b["images"].dtype == np.uint8
    assert b["labels"].shape == (8,)
    assert b["images"].std() > 0  # real pixels


def test_wsi_sampler_per_host_sharding(synthetic_cohort):
    table = load_slide_table(
        "TCGA", tile_size=128, target_kind="ER", test_fold=1, train=True,
        train_type="REG", n_tiles=4, data_root=str(synthetic_cohort),
    )
    sampler = WSITileSampler(table, n_tiles=4)
    rng0 = np.random.default_rng(7)
    rng1 = np.random.default_rng(7)
    b0 = list(sampler.batches(rng0, 4, process_index=0, process_count=2))
    b1 = list(sampler.batches(rng1, 4, process_index=1, process_count=2))
    # disjoint halves of the same epoch stream
    s0 = [tuple(b["slide_indices"]) for b in b0]
    s1 = [tuple(b["slide_indices"]) for b in b1]
    assert s0 != s1


def test_image_folder_dataset(tmp_path):
    for cls in ("neg", "pos"):
        os.makedirs(tmp_path / cls)
        for i in range(5):
            arr = np.full((32, 32, 3), 30 if cls == "neg" else 220, np.uint8)
            Image.fromarray(arr).save(tmp_path / cls / f"{i}.png")
    ds = ImageFolderDataset(str(tmp_path))
    assert len(ds) == 10 and ds.num_classes == 2
    batches = list(ds.batches(4, rng=np.random.default_rng(0)))
    assert len(batches) == 2
    assert batches[0]["images"].shape == (4, 32, 32, 3)


# ---------------------------------------------------------------------------
# --loan localized annotation labels (utils.py:144-149, 183-196)
# ---------------------------------------------------------------------------


def test_loan_annotation_labels_from_mask(synthetic_cohort):
    from tpuwsi.io.loan import LoanAnnotation, load_loan_annotation

    root = synthetic_cohort / "Breast" / "TCGA"
    os.makedirs(root / "local_labels", exist_ok=True)
    # 640² slide at ds=8 → 80² mask; left half (cols < 40) red==250
    mask = np.zeros((80, 80, 3), dtype=np.uint8)
    mask[:, :40, 0] = 250
    Image.fromarray(mask).save(root / "local_labels" / "slide_0-labels.png")

    ann = load_loan_annotation(str(root / "slide_0.png"))
    assert isinstance(ann, LoanAnnotation)
    # fully-red tile → 1; boundary tile (50% red) → 1; clear tile → 0
    assert ann.label(0, 0, 128) == 1
    assert ann.label(0, 256, 128) == 1
    assert ann.label(0, 320, 128) == 0
    assert ann.label(0, 384, 128) == 0
    # slide without an annotation file → None
    assert load_loan_annotation(str(root / "slide_1.png")) is None


def test_loan_sampler_emits_tile_labels(synthetic_cohort):
    root = synthetic_cohort / "Breast" / "TCGA"
    os.makedirs(root / "local_labels", exist_ok=True)
    mask = np.zeros((80, 80, 3), dtype=np.uint8)
    mask[:, :, 0] = 250  # everything annotated → every tile label 1
    for i in range(6):
        Image.fromarray(mask).save(
            root / "local_labels" / f"slide_{i}-labels.png"
        )
    table = load_slide_table(
        "TCGA", tile_size=128, target_kind="ER", test_fold=1, train=True,
        train_type="REG", n_tiles=4, data_root=str(synthetic_cohort),
    )
    sampler = WSITileSampler(
        table, n_tiles=4, bag_size=1, random_shift=False, loan=True,
        print_timing=True,
    )
    b = next(iter(sampler.batches(np.random.default_rng(0), 8)))
    assert b["labels"].shape == (8,)
    assert (b["labels"] == 1).all()  # tile labels, not the slide ER target
    # -time: the stage timer accumulated extraction timings
    td = sampler.stage_timer.time_dict()
    assert td["Average time to extract a tile"] > 0


# ---------------------------------------------------------------------------
# --slide_per_block (datasets.py:167-181, CARMEL-only)
# ---------------------------------------------------------------------------


def _carmel_cohort(tmp_path):
    root = tmp_path / "CARMEL_BLOCKS"
    os.makedirs(root / "Grids_10", exist_ok=True)
    rng = np.random.default_rng(0)
    files, barcodes = [], []
    # 3 blocks × 2 slides each: barcode[:-2] identifies the block
    for block in range(3):
        for s in range(2):
            name = f"c{block}_{s}.png"
            Image.fromarray(
                rng.integers(0, 255, (640, 640, 3), dtype=np.uint8)
            ).save(root / name)
            grid = [(r, c) for r in range(0, 512, 128) for c in range(0, 512, 128)]
            save_grid_pickle(str(grid_file_path(str(root), name, 10, 128)), grid)
            files.append(name)
            barcodes.append(f"77{block}5-{s}")
    total_col, legit_col = grid_data_columns(128, 10)
    from tpuwsi.utils.minixlsx import write_xlsx

    n = len(files)
    write_xlsx(
        str(root / "slides_data_CARMEL.xlsx"),
        pd.DataFrame({
            "file": files, "id": ["CARMEL"] * n,
            "patient barcode": barcodes,
            "ER status": ["Positive"] * n,
            "test fold idx": [2] * n,
            "Manipulated Objective Power": [10] * n,
        }),
    )
    write_xlsx(
        str(root / "Grids_10" / "Grid_data.xlsx"),
        pd.DataFrame({"file": files, total_col: [16] * n, legit_col: [16] * n}),
    )
    return {"CARMEL": str(root)}


def test_slide_per_block_keeps_one_slide_per_block(tmp_path):
    dir_dict = _carmel_cohort(tmp_path)
    full = load_slide_table(
        "CARMEL", tile_size=128, target_kind="ER", test_fold=1, train=True,
        train_type="REG", n_tiles=4, dir_dict=dir_dict,
    )
    assert len(full) == 6
    dedup = load_slide_table(
        "CARMEL", tile_size=128, target_kind="ER", test_fold=1, train=True,
        train_type="REG", n_tiles=4, dir_dict=dir_dict, slide_per_block=True,
    )
    assert len(dedup) == 3
    blocks = [b[:-2] for b in dedup.patient_barcodes]
    assert len(set(blocks)) == 3


def test_slide_per_block_rejects_non_carmel(synthetic_cohort):
    with pytest.raises(ValueError):
        load_slide_table(
            "TCGA", tile_size=128, target_kind="ER", test_fold=1, train=True,
            train_type="REG", n_tiles=4, data_root=str(synthetic_cohort),
            slide_per_block=True,
        )


def test_folder_class_map_train_split_channels(tmp_path):
    """timm --class-map / --train-split / --in-chans on the folder loader."""
    import numpy as np
    from PIL import Image

    from tpuwsi.io.folder import ImageFolderDataset, load_folder_datasets

    root = tmp_path / "ds"
    for cls in ("aa", "bb"):
        d = root / "training" / cls
        d.mkdir(parents=True)
        for i in range(2):
            Image.fromarray(
                np.full((8, 8, 3), 100, np.uint8)
            ).save(d / f"{i}.png")
    cmap = tmp_path / "classes.txt"
    cmap.write_text("zz\nbb\naa\n")  # aa→2, bb→1, zz→0 (line order)

    train_ds, val_ds = load_folder_datasets(
        str(root), train_split="training", class_map=str(cmap)
    )
    assert val_ds is None
    assert train_ds.class_to_idx == {"aa": 2, "bb": 1}
    assert train_ds.num_classes == 3  # index space from the map
    labels = sorted(lbl for _, lbl in train_ds.samples)
    assert labels == [1, 1, 2, 2]

    # grayscale loading (--in-chans 1)
    ds1 = ImageFolderDataset(str(root / "training"), channels=1)
    assert ds1.load(0).shape == (8, 8, 1)

    # unknown class dir → loud error
    import pytest as _pytest

    bad = tmp_path / "bad.txt"
    bad.write_text("aa\n")
    with _pytest.raises(KeyError, match="bb"):
        load_folder_datasets(str(root), train_split="training",
                             class_map=str(bad))
