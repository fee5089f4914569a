"""Survival (censored-regression) dataset family.

Parity: the four survival classes (datasets.py:2354-3461) —
``WSI_Master_Dataset_Survival_CR`` / ``WSI_REGdataset_Survival_CR`` /
``WSI_Master_Dataset_Survival`` / ``Infer_Dataset_Survival``:
- survival columns: 'Censored', 'Follow-up Months Since Diagnosis',
  'survival status', 'Exclude for time prediction?' (datasets.py:2440-2443);
- validity = not excluded AND censor flag present (:2452-2459);
- censor-status filters ``is_all_censored`` / ``is_all_not_censored``
  (:3039-3046);
- per-slide outputs Binary Target / Time Target / Censored / Tile Locations
  (:2709-2719);
- censor-balanced training subset (utils.py:605-641 ``balance_dataset``
  censor_balance branch).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterator, List, Optional

import numpy as np
import pandas as pd

from tpuwsi.io.cohorts import get_datasets_dir_dict
from tpuwsi.io.grids import grid_data_columns
from tpuwsi.io.metadata import SlideTable, _read_table
from tpuwsi.utils.labels import get_label

SURVIVAL_COLUMNS = (
    "Censored",
    "Follow-up Months Since Diagnosis",
    "survival status",
    "Exclude for time prediction?",
)


def load_survival_slide_table(
    dataset: str = "ABCTB",
    tile_size: int = 256,
    test_fold=1,
    infer_folds=(None,),
    train: bool = True,
    train_type: str = "REG",
    n_tiles: int = 10,
    bag_size: int = 50,
    desired_magnification: int = 10,
    is_all_censored: bool = False,
    is_all_not_censored: bool = False,
    censor_balance: bool = False,
    data_root: Optional[str] = None,
    dir_dict: Optional[Dict[str, str]] = None,
    rng: Optional[np.random.Generator] = None,
) -> SlideTable:
    import os

    dir_dict = dir_dict or get_datasets_dir_dict(dataset, data_root=data_root)
    frames = []
    for cohort_id, cohort_dir in dir_dict.items():
        slides = _read_table(os.path.join(cohort_dir, f"slides_data_{cohort_id}"))
        grids = _read_table(
            os.path.join(cohort_dir, f"Grids_{desired_magnification}", "Grid_data")
        )
        frames.append(pd.merge(slides, grids, on="file", how="inner"))
    df = pd.concat(frames, ignore_index=True)

    censored = np.asarray(df["Censored"], dtype=float)
    time_target = np.asarray(
        df["Follow-up Months Since Diagnosis"], dtype=float
    )
    binary_target = list(df["survival status"])
    excluded = np.asarray(df["Exclude for time prediction?"], dtype=object)

    # NaN follow-up time must be dropped too: a single uncensored NaN-time
    # slide gives the Cox loss an empty risk set (NaN comparisons are
    # all-False) → log_denom = -inf → loss +inf, NaN-ing the whole run
    valid = np.where(
        (excluded != "Exclude") & ~np.isnan(censored) & ~np.isnan(time_target)
    )[0]

    total_col, legit_col = grid_data_columns(tile_size, desired_magnification)
    bad = (
        set(df.index[df[total_col] == -1])
        | set(df.index[df[legit_col] == 0])
        | (
            set(df.index[df["bad segmentation"] == 1])
            if "bad segmentation" in df.columns
            else set()
        )
    )
    n_minimal = n_tiles if train_type == "REG" else (bag_size or 0)
    bad |= set(df.index[df[legit_col] < n_minimal])
    valid = np.array(sorted(set(valid.tolist()) - bad))

    fold_col = (
        "test fold idx breast" if dataset in ("CAT", "ABCTB_TCGA") else "test fold idx"
    )
    test_fold_val = "test" if test_fold == 0 else test_fold  # metadata.py:294
    if train_type in ("REG", "MIL"):
        if train:
            folds = list(df[fold_col].unique())
            for f in (test_fold_val, "test", "val"):
                if f in folds:
                    folds.remove(f)
        else:
            folds = [test_fold_val, "val"]
    elif train_type == "Infer":
        # fold 0 is stored as the string 'test' in the fold column — the
        # same aliasing the main loader applies (metadata.py:307); without
        # it --test-fold 0 selects an empty eval table
        folds = ["test" if f == 0 else f for f in infer_folds]
    else:  # Infer_All_Folds
        folds = list(df[fold_col].unique())
    in_folds = df[fold_col].iloc[valid].isin(folds)
    valid = np.asarray(valid)[np.asarray(in_folds)]

    # censor-status filters (datasets.py:3039-3046)
    keep = []
    for i in valid:
        c = censored[i] == 1
        if (is_all_not_censored and c) or (is_all_censored and not c):
            continue
        keep.append(i)
    valid = np.asarray(keep, dtype=int)

    if censor_balance and train:
        # balance: all not-censored + an equal random sample of censored
        rng = rng or np.random.default_rng(2021)
        nc = [i for i in valid if censored[i] == 0]
        cc = [i for i in valid if censored[i] == 1]
        take = rng.choice(cc, size=min(len(nc), len(cc)), replace=False)
        valid = np.asarray(sorted(nc + list(take)))

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
        targets=[-1] * len(valid),  # survival: class target unused (:3055-3058)
        magnifications=list(sel["Manipulated Objective Power"]),
        patient_barcodes=list(sel["patient barcode"]),
        target_kind="survival",
        censored=[bool(censored[i]) for i in valid],
        target_binary=[binary_target[i] for i in valid],
        target_cont=[float(time_target[i]) for i in valid],
    )


def survival_batches(
    sampler,
    rng: np.random.Generator,
    batch_size: int,
    **kw,
) -> Iterator[Dict[str, np.ndarray]]:
    """Wrap WSITileSampler batches with survival targets
    (Binary Target / Time Target / Censored, datasets.py:2709-2719)."""
    table = sampler.table
    binary = np.asarray(
        [get_label(t)[0] for t in table.target_binary], dtype=np.int64
    )
    times = np.asarray(table.target_cont, dtype=np.float32)
    cens = np.asarray(table.censored, dtype=bool)
    for batch in sampler.batches(rng, batch_size, **kw):
        idx = batch["slide_indices"]
        batch["binary_targets"] = binary[idx]
        batch["time_targets"] = times[idx]
        batch["censored"] = cens[idx]
        yield batch
