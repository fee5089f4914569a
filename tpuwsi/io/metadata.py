"""Slide metadata: load, merge, filter, and fold-split cohort tables.

Parity: WSI_Master_Dataset.__init__ (datasets.py:28-443) — merging per-cohort
``slides_data_<id>.xlsx`` with ``Grids_<mag>/Grid_data.xlsx`` on 'file'
(:98-115), dropping null ids (:117-119), PORTO lung-origin filter (:125-128),
ER balancing hook (:130-134), the 'OR' composite target (:136-144), survival
targets (:146-157), multi-target '+' kinds (:55-61, :159-164), LEUKEMIA day
filters (:182-188), valid-label selection incl. numeric multiclass
(:192-213), no-grid/zero-tile/few-tile/bad-seg/er≠pr exclusions (:220-258),
RAM_saver subsampling (:260-264), and fold selection for
REG/MIL/Infer/Infer_All_Folds incl. the CAT breast fold column (:266-304).

The xlsx schemas are load-bearing and kept byte-compatible; a parquet/CSV
fallback is accepted transparently for sane new deployments.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional, Sequence

import numpy as np
import pandas as pd

from tpuwsi.io.cohorts import get_datasets_dir_dict
from tpuwsi.io.grids import grid_data_columns
from tpuwsi.utils.labels import assert_dataset_target, cohort_to_int, get_label


def _read_table(path_no_ext: str) -> pd.DataFrame:
    """Read xlsx (reference format) with csv/parquet fallbacks."""
    from tpuwsi.utils.minixlsx import read_table as _read_xlsx

    for ext, reader in (
        (".xlsx", _read_xlsx),
        (".csv", pd.read_csv),
        (".parquet", pd.read_parquet),
    ):
        p = path_no_ext + ext
        if os.path.isfile(p):
            return reader(p)
    raise FileNotFoundError(path_no_ext + ".xlsx")


@dataclasses.dataclass
class SlideTable:
    """Filtered, fold-selected slide list ready for samplers."""

    dataset: str
    tile_size: int
    desired_magnification: int
    file_names: List[str]
    path_names: List[str]  # cohort directory per slide
    cohort_ids: List[str]
    folds: List
    tissue_tiles: List[int]
    targets: List  # raw target strings/values
    magnifications: List[float]
    patient_barcodes: List[str]
    multi_target: bool = False
    target_kind: object = "ER"
    # survival extras
    censored: Optional[List] = None
    target_binary: Optional[List] = None
    target_cont: Optional[List] = None
    cohort_ints: Optional[List[int]] = None

    def __len__(self):
        return len(self.file_names)

    def labels(self) -> np.ndarray:
        out = [get_label(t, self.multi_target) for t in self.targets]
        return np.asarray(out, dtype=np.int64)

    def slide_path(self, idx: int) -> str:
        return os.path.join(self.path_names[idx], self.file_names[idx])


def split_table(
    table: SlideTable, train_fraction: float = 0.8,
    rng: Optional[np.random.Generator] = None,
) -> tuple:
    """--supervised 80/20 random split parity (train.py:715-717): partition
    one table's slides into train/val subsets."""
    rng = rng or np.random.default_rng(0)
    n = len(table)
    order = rng.permutation(n)
    n_train = int(round(n * train_fraction))
    def take(idxs):
        idxs = sorted(int(i) for i in idxs)
        return dataclasses.replace(
            table,
            file_names=[table.file_names[i] for i in idxs],
            path_names=[table.path_names[i] for i in idxs],
            cohort_ids=[table.cohort_ids[i] for i in idxs],
            tissue_tiles=[table.tissue_tiles[i] for i in idxs],
            targets=[table.targets[i] for i in idxs],
            magnifications=[table.magnifications[i] for i in idxs],
            patient_barcodes=[table.patient_barcodes[i] for i in idxs],
            censored=[table.censored[i] for i in idxs] if table.censored else None,
            target_binary=(
                [table.target_binary[i] for i in idxs] if table.target_binary else None
            ),
            target_cont=(
                [table.target_cont[i] for i in idxs] if table.target_cont else None
            ),
            cohort_ints=(
                [table.cohort_ints[i] for i in idxs] if table.cohort_ints else None
            ),
        )

    return take(order[:n_train]), take(order[n_train:])


def load_slide_table(
    dataset: str = "TCGA",
    tile_size: int = 256,
    target_kind="ER",
    test_fold=1,
    infer_folds: Sequence = (None,),
    train: bool = True,
    train_type: str = "REG",
    n_tiles: int = 10,
    bag_size: int = 50,
    desired_magnification: int = 10,
    dx: bool = False,
    er_eq_pr: bool = False,
    ram_saver: bool = False,
    balanced_dataset: bool = False,
    slide_per_block: bool = False,
    data_root: Optional[str] = None,
    dir_dict: Optional[Dict[str, str]] = None,
    rng: Optional[np.random.Generator] = None,
) -> SlideTable:
    multi_target = isinstance(target_kind, str) and "+" in target_kind
    if multi_target:
        target_kind = target_kind.split("+")
    assert_dataset_target(dataset, target_kind)

    dir_dict = dir_dict or get_datasets_dir_dict(dataset, data_root=data_root)
    frames = []
    for cohort_id, cohort_dir in dir_dict.items():
        slides = _read_table(
            os.path.join(cohort_dir, f"slides_data_{cohort_id}")
        )
        grids = _read_table(
            os.path.join(cohort_dir, f"Grids_{desired_magnification}", "Grid_data")
        )
        merged = pd.merge(
            slides, grids, on="file", how="inner", suffixes=("", "_grid")
        )
        frames.append(merged)
    df = pd.concat(frames, ignore_index=True)

    if df["id"].isnull().sum() > 0:
        df = df[df["id"].notnull()]
        df = df.reset_index(drop=True)

    if dataset in ("PORTO_HE", "PORTO_PDL1"):
        df = df[df["Origin"] == "lung"].reset_index(drop=True)

    if balanced_dataset and target_kind in ("ER", "ER100"):
        # patient-level ER balancing (datasets.py:130-134, utils.py:605-665)
        from tpuwsi.utils.balance import balance_dataset_er

        df = balance_dataset_er(df, rng)
        df = df[df["use_in_balanced_data_ER"] == 1].reset_index(drop=True)

    # Targets
    survival = target_kind in ("Survival_Time", "Survival_Binary")
    all_censored = all_cont = all_binary = all_cohorts = None
    if survival:
        all_censored = list(df["Censored"])
        all_cont = list(df["Time (months)"])
        all_binary = list(df["Survival Binary (5 Yr)"])
        all_cohorts = cohort_to_int(list(df["id"]))
        all_targets = all_binary if target_kind == "Survival_Binary" else all_cont
    elif target_kind == "OR":
        pr = list(df["PR status"])
        er = list(df["ER status"])
        all_targets = []
        for p, e in zip(pr, er):
            if p == "Positive" or e == "Positive":
                all_targets.append("Positive")
            elif p == "Negative" or e == "Negative":
                all_targets.append("Negative")
            else:
                all_targets.append("Missing Data")
    elif multi_target:
        all_targets = [
            tuple(df[f"{t} status"].iloc[i] for t in target_kind)
            for i in range(len(df))
        ]
    else:
        all_targets = list(df[f"{target_kind} status"])

    # --slide_per_block (datasets.py:167-181): CARMEL-only — a patient
    # barcode's last two characters index the slide within its tissue block;
    # keep only the first slide per block. (The reference's non-CARMEL branch
    # constructs an IOError without raising it — we raise properly.)
    excess = set()
    if slide_per_block:
        if dataset == "CARMEL":
            barcodes = list(df["patient barcode"])
            blocks = [
                b[:-2] if isinstance(b, str) else str(b) for b in barcodes
            ]
            _, unique_inds = np.unique(
                np.asarray(blocks, dtype=object).astype(str), return_index=True
            )
            excess |= set(range(len(df))) - set(int(i) for i in unique_inds)
        else:
            raise ValueError(
                "slide_per_block only implemented for CARMEL dataset"
            )

    # LEUKEMIA day filters (datasets.py:182-188)
    if dataset in ("LEUKEMIA", "ALL"):
        day_col = "Day_0/15/33_fixed"
        want = {"MRD_day33": 33, "MRD_day15": 15}.get(
            target_kind if isinstance(target_kind, str) else "", 0
        )
        excess |= set(df.index[df[day_col] != want])

    # Valid labels (datasets.py:192-213)
    if target_kind == "Survival_Time":
        valid = np.where(~np.isnan(np.asarray(all_targets, dtype=float)))[0]
    elif multi_target:
        arr = np.asarray(all_targets, dtype=object)
        valid = np.where(
            np.any((arr == "Positive") | (arr == "Negative"), axis=1)
        )[0]
    else:
        as_str = []
        for t in all_targets:
            if isinstance(t, (int, float)) and not (
                isinstance(t, float) and np.isnan(t)
            ):
                as_str.append(str(int(t)))
            else:
                as_str.append(str(t))
        as_str = np.asarray(as_str)
        valid = np.where(
            np.isin(as_str, ["Positive", "Negative"])
            | np.isin(as_str, [str(d) for d in range(10)])
        )[0]

    if len(valid) == 0 or train_type == "Infer_All_Folds":
        valid = np.arange(len(all_targets))

    total_col, legit_col = grid_data_columns(tile_size, desired_magnification)
    no_grid = set(df.index[df[total_col] == -1])
    zero_tiles = set(df.index[df[legit_col] == 0])
    bad_seg = (
        set(df.index[df["bad segmentation"] == 1])
        if "bad segmentation" in df.columns
        else set()
    )
    er_not_pr = (
        set(df.index[df["ER status"] != df["PR status"]])
        if er_eq_pr and train
        else set()
    )
    # few-tiles minimum: REG→n_tiles, MIL→bag_size, Infer→none (the reference
    # passes bag_size=None on the Infer path, datasets.py:649, so the < filter
    # is vacuous there).
    if train_type == "REG":
        n_minimal = n_tiles
    elif train_type == "MIL":
        n_minimal = bag_size
    else:
        n_minimal = 0
    few_tiles = set(df.index[df[legit_col] < n_minimal])

    valid = np.array(
        sorted(
            set(valid.tolist())
            - no_grid - zero_tiles - bad_seg - er_not_pr - few_tiles - excess
        )
    )

    if ram_saver and len(valid) > 0:
        rng = rng or np.random.default_rng()
        valid = rng.choice(valid, size=round(len(valid) / 4), replace=False)

    # Fold selection (datasets.py:266-304)
    if dataset in ("CAT", "ABCTB_TCGA"):
        fold_col = "test fold idx breast"
    elif target_kind in ("is_tel_aml_B", "is_tel_aml_non_hr_B"):
        fold_col = "test fold idx for is_tel_aml_B"
    else:
        fold_col = "test fold idx"
    test_fold_val = "test" if test_fold == 0 else test_fold

    if train_type in ("REG", "MIL"):
        if train:
            folds = list(df[fold_col].unique())
            if test_fold != -1 and test_fold_val in folds:
                folds.remove(test_fold_val)
            for special in ("test", "val"):
                if special in folds:
                    folds.remove(special)
        else:
            folds = [test_fold_val, "val"] if test_fold != -1 else []
    elif train_type == "Infer":
        folds = ["test" if f == 0 else f for f in infer_folds]
    elif train_type == "Infer_All_Folds":
        folds = list(df[fold_col].unique())
    else:
        raise ValueError(f"train_type {train_type!r} is not defined")

    in_folds = df[fold_col].iloc[valid].isin(folds)
    valid = np.asarray(valid)[np.asarray(in_folds)]

    # DX filter (TCGA-only, datasets.py:313-316, 369-370)
    if "TCGA" not in dir_dict:
        dx = False
    if dx:
        keep = [i for i in valid if bool(df["DX"].iloc[i])]
        valid = np.asarray(keep)

    sel = df.iloc[valid]
    return SlideTable(
        dataset=dataset,
        tile_size=tile_size,
        desired_magnification=desired_magnification,
        file_names=list(sel["file"]),
        path_names=[dir_dict[i] for i in sel["id"]],
        cohort_ids=list(sel["id"]),
        folds=folds,
        tissue_tiles=list(sel[legit_col]),
        targets=[all_targets[i] for i in valid],
        magnifications=list(sel["Manipulated Objective Power"]),
        patient_barcodes=list(sel["patient barcode"]),
        multi_target=multi_target,
        target_kind=target_kind,
        censored=[all_censored[i] for i in valid] if survival else None,
        target_binary=[all_binary[i] for i in valid] if survival else None,
        target_cont=[all_cont[i] for i in valid] if survival else None,
        cohort_ints=[all_cohorts[i] for i in valid] if survival else None,
    )
