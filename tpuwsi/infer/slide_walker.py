"""Slide-level inference walker.

Parity: ``Infer_Dataset`` (datasets.py:634-817) — per-slide tile budget
``min(num_tiles, legitimate)`` (:684-688), random patch subset or
patch-dir-resumed exact locations (:693-696, :766-773), ``tiles_per_iter``
chunking (:698), stateful slide walking with 'Is Last Batch' (:783-803),
``resume_slide`` (:674-680), and ``reset_counter`` (:816).

TPU-first difference: chunks are PADDED to a fixed ``tiles_per_iter`` with a
validity mask, so the jitted forward sees one static shape for the whole
inference run (SURVEY §7 hard-part 3). AUC aggregation over masked tiles is
exactly equivalent to the reference's ragged chunks.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np
import pandas as pd

from tpuwsi.io.grids import grid_file_path, load_grid_pickle
from tpuwsi.io.levels import get_optimal_slide_level
from tpuwsi.io.metadata import SlideTable
from tpuwsi.io.slide_readers import open_slide
from tpuwsi.io.tiles import TileStats, get_tiles
from tpuwsi.utils.labels import get_label


@dataclasses.dataclass
class InferChunk:
    images: np.ndarray  # (tiles_per_iter, ts, ts, 3) uint8, padded
    mask: np.ndarray  # (tiles_per_iter,) bool
    label: np.ndarray  # int label(s)
    slide_index: int
    slide_name: str
    patient_barcode: str
    slide_dataset: str
    initial_num_tiles: int
    is_last_batch: bool
    locations: List[Tuple[int, int]]  # valid tile locations (level-0)
    # Raw per-slide target (can be -1 for unknown); the reference keeps this
    # distinct from `label` in the MIL feature pickles (datasets.py:1048-1055,
    # :1195-1196). Defaults to the label for callers with a single column.
    target: Optional[int] = None
    # Survival walker extras (Infer_Dataset_Survival, datasets.py:3449-3461)
    binary_target: Optional[int] = None
    time_target: Optional[float] = None
    censored: Optional[bool] = None


class SlideWalker:
    def __init__(
        self,
        table: SlideTable,
        tiles_per_iter: int = 500,
        num_tiles: int = 500,
        resume_slide: int = 0,
        patch_dir: str = "",
        rng: Optional[np.random.Generator] = None,
    ):
        self.table = table
        self.tiles_per_iter = tiles_per_iter
        self.num_tiles_budget = num_tiles
        self.resume_slide = resume_slide
        self.patch_dir = patch_dir
        self.rng = rng or np.random.default_rng(0)
        self.stats = TileStats()

        self.num_tiles: List[int] = []
        self.slides_with_not_enough = 0
        for i in range(len(table)):
            t = int(table.tissue_tiles[i])
            if num_tiles <= t and t > 0:
                self.num_tiles.append(num_tiles)
            else:
                self.num_tiles.append(t)
                self.slides_with_not_enough += 1

        self._patch_xy: Optional[Tuple[pd.DataFrame, pd.DataFrame]] = None
        if patch_dir:
            from glob import glob

            xf = glob(os.path.join(patch_dir, "*_x.csv"))
            yf = glob(os.path.join(patch_dir, "*_y.csv"))
            if len(xf) != 1 or len(yf) != 1:
                raise IOError("patch location files not found (or ambiguous) in dir")
            self._patch_xy = (pd.read_csv(xf[0]), pd.read_csv(yf[0]))

    def __len__(self):
        n = np.asarray(self.num_tiles[self.resume_slide :], dtype=float)
        return int(np.ceil(n / self.tiles_per_iter).sum())

    def _slide_locations(self, idx: int) -> List[Tuple[int, int]]:
        name = self.table.file_names[idx]
        if self._patch_xy is not None:
            x_pd, y_pd = self._patch_xy
            row_x = x_pd.loc[x_pd["slide_name"] == name]
            row_y = y_pd.loc[y_pd["slide_name"] == name]
            if len(row_x) != 1 or len(row_y) != 1:
                raise IOError(
                    f"slide {name!r} missing (or duplicated) in the patch "
                    "location CSVs — the resume CSVs must come from a run "
                    "over the same slide set"
                )
            # replay the SAVED locations: the CSV row's non-null count is
            # authoritative, not the current --num_tiles budget (a resume
            # with a larger budget would KeyError past the saved columns,
            # and NaN padding from wider rows must be excluded)
            cols = [
                c for c in x_pd.columns
                if c != "slide_name" and not np.isnan(float(row_x[c].item()))
            ]
            n = min(len(cols), self.num_tiles[idx])
            return [
                (int(row_y[str(i)].item()), int(row_x[str(i)].item()))
                for i in range(n)
            ]
        grid = load_grid_pickle(
            grid_file_path(
                self.table.path_names[idx],
                name,
                self.table.desired_magnification,
                self.table.tile_size,
            )
        )
        which = self.rng.choice(
            int(self.table.tissue_tiles[idx]),
            size=self.num_tiles[idx],
            replace=False,
        )
        return [grid[i] for i in which]

    def walk(self) -> Iterator[InferChunk]:
        ts = self.table.tile_size
        tpi = self.tiles_per_iter
        for idx in range(self.resume_slide, len(self.table)):
            reader = open_slide(self.table.slide_path(idx))
            best_level, adjusted, level0 = get_optimal_slide_level(
                reader.level_downsamples,
                self.table.magnifications[idx],
                self.table.desired_magnification,
                ts,
            )
            locs = self._slide_locations(idx)
            label = np.asarray(
                get_label(self.table.targets[idx], self.table.multi_target),
                dtype=np.int64,
            )
            n = len(locs)
            for start in range(0, n, tpi):
                chunk_locs = locs[start : start + tpi]
                tiles = get_tiles(
                    reader, chunk_locs, level0, adjusted, ts, best_level,
                    random_shift=False, stats=self.stats,
                )
                k = len(chunk_locs)
                images = np.zeros((tpi, ts, ts, 3), dtype=np.uint8)
                images[:k] = tiles
                mask = np.zeros((tpi,), dtype=bool)
                mask[:k] = True
                yield InferChunk(
                    images=images,
                    mask=mask,
                    label=label,
                    slide_index=idx,
                    slide_name=self.table.file_names[idx],
                    patient_barcode=str(self.table.patient_barcodes[idx]),
                    slide_dataset=self.table.cohort_ids[idx],
                    initial_num_tiles=n,
                    is_last_batch=(start + tpi >= n),
                    locations=chunk_locs,
                    target=int(np.asarray(label).ravel()[0]),
                )
            reader.close()

    def save_patch_locations(self, out_dir: str, all_locations: Dict[str, list]):
        """Write the <name>_x.csv / <name>_y.csv resume files
        (datasets.py:330-345 format: one row per slide, columns 0..N-1)."""
        os.makedirs(out_dir, exist_ok=True)
        names = list(all_locations.keys())
        max_n = max(len(v) for v in all_locations.values())
        x_rows, y_rows = [], []
        for name in names:
            locs = all_locations[name]
            x_rows.append([loc[1] for loc in locs] + [None] * (max_n - len(locs)))
            y_rows.append([loc[0] for loc in locs] + [None] * (max_n - len(locs)))
        cols = [str(i) for i in range(max_n)]
        dfx = pd.DataFrame(x_rows, columns=cols)
        dfx.insert(0, "slide_name", names)
        dfy = pd.DataFrame(y_rows, columns=cols)
        dfy.insert(0, "slide_name", names)
        dfx.to_csv(os.path.join(out_dir, "patch_locs_x.csv"), index=False)
        dfy.to_csv(os.path.join(out_dir, "patch_locs_y.csv"), index=False)
