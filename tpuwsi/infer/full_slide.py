"""Full-slide heatmap inference.

Parity: ``One_Full_Slide_Inference_Dataset`` (datasets.py:2043-2132) and
``Batched_Full_Slide_Inference_Dataset`` (:2135-2351) — walk EVERY tile of a
slide (tissue + sampled background), carry the equivalent-grid coordinates
(location // adjusted_tile_size, utils.py:592-602
``map_original_grid_list_to_equiv_grid_list``), and reconstruct a per-slide
score heatmap; slide lists come from an ``Infer_Slides.txt`` file
(:2143-2150).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from tpuwsi.io.grids import grid_file_path, load_grid_pickle
from tpuwsi.io.levels import get_optimal_slide_level
from tpuwsi.io.slide_readers import SlideReader, open_slide
from tpuwsi.io.tiles import get_tiles

Location = Tuple[int, int]


def map_to_equivalent_grid(
    locations: Sequence[Location], adjusted_tile_size: int
) -> List[Location]:
    """utils.py:592-602 parity."""
    return [
        (loc[0] // adjusted_tile_size, loc[1] // adjusted_tile_size)
        for loc in locations
    ]


def read_infer_slides_file(path: str) -> List[str]:
    """Infer_Slides.txt: one slide filename per line (datasets.py:2143-2150)."""
    with open(path) as f:
        return [line.strip() for line in f if line.strip()]


@dataclasses.dataclass
class FullSlideChunk:
    images: np.ndarray  # (tiles_per_iter, ts, ts, 3) uint8 padded
    mask: np.ndarray  # validity
    is_tissue: np.ndarray  # (tiles_per_iter,) bool — from the tissue grid
    equivalent_locations: np.ndarray  # (tiles_per_iter, 2) int
    slide_name: str
    equivalent_grid_shape: Tuple[int, int]
    is_last_batch: bool


class FullSlideWalker:
    """Walks the complete regular grid of one slide in padded chunks."""

    def __init__(
        self,
        slide_path: str,
        magnification: float,
        tile_size: int = 256,
        desired_magnification: int = 10,
        tiles_per_iter: int = 100,
        tissue_grid: Optional[Sequence[Location]] = None,
        grid_dir: Optional[str] = None,
        background_sample_fraction: float = 1.0,
        rng: Optional[np.random.Generator] = None,
    ):
        self.reader: SlideReader = open_slide(slide_path)
        self.slide_name = os.path.basename(slide_path)
        self.tile_size = tile_size
        self.tiles_per_iter = tiles_per_iter
        (self.best_level, self.adjusted_tile_size, self.level0_tile_size) = (
            get_optimal_slide_level(
                self.reader.level_downsamples, magnification,
                desired_magnification, tile_size,
            )
        )
        if tissue_grid is None and grid_dir is not None:
            tissue_grid = load_grid_pickle(
                grid_file_path(
                    grid_dir, self.slide_name, desired_magnification, tile_size
                )
            )
        tissue = set(map(tuple, tissue_grid or []))

        w, h = self.reader.dimensions
        step = self.level0_tile_size
        # equivalent grid covers the whole slide (datasets.py:2077-2083)
        self.equivalent_grid_shape = (
            int(np.ceil(h / step)), int(np.ceil(w / step))
        )
        rng = rng or np.random.default_rng(0)
        self.locations: List[Location] = []
        self.tissue_flags: List[bool] = []
        for top in range(0, h - step + 1, step):
            for left in range(0, w - step + 1, step):
                is_t = (top, left) in tissue
                if not is_t and background_sample_fraction < 1.0:
                    if rng.random() > background_sample_fraction:
                        continue  # sampled background (datasets.py:2222-2230)
                self.locations.append((top, left))
                self.tissue_flags.append(is_t)

    def __len__(self):
        return int(np.ceil(len(self.locations) / self.tiles_per_iter))

    def close(self):
        """Release the slide handle — a multi-slide inference run (one
        walker per Infer_Slides.txt entry) leaks file descriptors and
        reader caches otherwise."""
        self.reader.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def walk(self) -> Iterator[FullSlideChunk]:
        ts = self.tile_size
        tpi = self.tiles_per_iter
        n = len(self.locations)
        for start in range(0, n, tpi):
            locs = self.locations[start : start + tpi]
            flags = self.tissue_flags[start : start + tpi]
            tiles = get_tiles(
                self.reader, locs, self.level0_tile_size,
                self.adjusted_tile_size, ts, self.best_level,
                random_shift=False,
            )
            k = len(locs)
            images = np.zeros((tpi, ts, ts, 3), np.uint8)
            images[:k] = tiles
            mask = np.zeros((tpi,), bool)
            mask[:k] = True
            is_tissue = np.zeros((tpi,), bool)
            is_tissue[:k] = flags
            equiv = np.zeros((tpi, 2), np.int64)
            equiv[:k] = np.asarray(
                map_to_equivalent_grid(locs, self.level0_tile_size)
            )
            yield FullSlideChunk(
                images=images,
                mask=mask,
                is_tissue=is_tissue,
                equivalent_locations=equiv,
                slide_name=self.slide_name,
                equivalent_grid_shape=self.equivalent_grid_shape,
                is_last_batch=(start + tpi >= n),
            )


def assemble_heatmap(
    shape: Tuple[int, int],
    equivalent_locations: np.ndarray,
    scores: np.ndarray,
    fill: float = np.nan,
) -> np.ndarray:
    """Scatter per-tile scores into the equivalent grid → (gh, gw) heatmap."""
    heat = np.full(shape, fill, dtype=np.float32)
    for (r, c), s in zip(equivalent_locations, scores):
        heat[r, c] = s
    return heat
