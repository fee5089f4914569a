"""Tile extraction from slides.

Parity: utils.py:64-108 ``_choose_data`` and :111-210 ``_get_tiles`` —
sampling grid locations without replacement, the random ±half-tile shift with
the reference's exact border-clamping rules (utils.py:152-170), blank-patch
fallback on read failure (:175-181 — reproduced but *counted*, the reference
fails silently), the 2× ``oversized_HC_tiles`` mode (:139-142), and resize to
the output tile size (:198-199).

Randomness is an explicit numpy Generator (the reference uses the global
``random`` module per DataLoader worker) — statistics preserved, reproducible.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

from tpuwsi.io.levels import get_optimal_slide_level
from tpuwsi.io.slide_readers import SlideReader

Location = Tuple[int, int]


@dataclasses.dataclass
class TileStats:
    """Observability the reference lacks: blank-fallback count (SURVEY §5.3)."""

    read_failures: int = 0
    tiles_read: int = 0


def choose_locations(
    rng: np.random.Generator, grid: Sequence[Location], how_many: int
) -> List[Location]:
    """Sample without replacement (utils.py:93 ``random.sample`` parity)."""
    if how_many > len(grid):
        raise ValueError("Requested more tiles than available by the grid list")
    idxs = rng.choice(len(grid), size=how_many, replace=False)
    return [grid[i] for i in idxs]


def shifted_origin(
    rng: Optional[np.random.Generator],
    loc: Location,
    tile_size_level_0: int,
    slide_dimensions: Tuple[int, int],
    random_shift: bool,
    oversized: bool = False,
) -> Tuple[int, int]:
    """(top, left) after the reference's random shift + border clamping
    (utils.py:152-170). slide_dimensions is (width, height)."""
    if random_shift:
        half = tile_size_level_0 // 2
        shift = rng.choice(np.arange(-half, half), size=2, replace=False)
        shift = (int(shift[0]), int(shift[1]))
    elif oversized:
        shift = (tile_size_level_0 // 2, tile_size_level_0 // 2)
    else:
        return loc[0], loc[1]

    top = loc[0] - shift[0]
    left = loc[1] - shift[1]
    bottom = top + tile_size_level_0
    right = left + tile_size_level_0
    if top < 0:
        top = 0
    if left < 0:
        left = 0
    if bottom > slide_dimensions[1]:
        top -= bottom - slide_dimensions[1]
    if right > slide_dimensions[0]:
        left -= right - slide_dimensions[0]
    return top, left


def get_tiles(
    reader: SlideReader,
    locations: Sequence[Location],
    tile_size_level_0: int,
    adjusted_tile_size: int,
    output_tile_size: int,
    best_slide_level: int,
    rng: Optional[np.random.Generator] = None,
    random_shift: bool = False,
    oversized_hc_tiles: bool = False,
    stats: Optional[TileStats] = None,
    loan=None,  # Optional[tpuwsi.io.loan.LoanAnnotation]
) -> np.ndarray:
    """Extract len(locations) tiles → uint8 (N, output, output, 3).

    With ``loan`` set, returns (tiles, labels) where labels are the per-tile
    localized-annotation labels computed from each tile's post-shift origin
    (utils.py:183-196 parity: red-zone fraction of the QuPath mask over the
    adjusted tile extent).
    """
    if oversized_hc_tiles:
        adjusted_tile_size *= 2
        output_tile_size *= 2

    out = np.zeros(
        (len(locations), output_tile_size, output_tile_size, 3), dtype=np.uint8
    )
    loan_labels = np.zeros(len(locations), dtype=np.int64) - 1
    for i, loc in enumerate(locations):
        top, left = shifted_origin(
            rng, loc, tile_size_level_0, reader.dimensions,
            random_shift, oversized_hc_tiles,
        )
        if loan is not None:
            loan_labels[i] = loan.label(top, left, adjusted_tile_size)
        try:
            tile = reader.read_region(
                (left, top), best_slide_level, (adjusted_tile_size, adjusted_tile_size)
            )
            if stats is not None:
                stats.tiles_read += 1
        except Exception:
            logging.info(
                "failed to read slide %s at (%d, %d); taking blank patch",
                getattr(reader, "path", "?"), left, top,
            )
            if stats is not None:
                stats.read_failures += 1
            tile = np.zeros(
                (adjusted_tile_size, adjusted_tile_size, 3), dtype=np.uint8
            )
        if adjusted_tile_size != output_tile_size:
            tile = np.asarray(
                Image.fromarray(tile).resize((output_tile_size, output_tile_size))
            )
        out[i] = tile
    if loan is not None:
        return out, loan_labels
    return out


def choose_data(
    reader: SlideReader,
    grid: Sequence[Location],
    how_many: int,
    magnification: float,
    tile_size: int = 256,
    desired_mag: float = 20,
    rng: Optional[np.random.Generator] = None,
    random_shift: bool = True,
    stats: Optional[TileStats] = None,
) -> Tuple[np.ndarray, List[Location]]:
    """utils.py:64-108 parity: sample + extract. Returns (tiles, locations)."""
    rng = rng or np.random.default_rng()
    best_level, adjusted, level0 = get_optimal_slide_level(
        reader.level_downsamples, magnification, desired_mag, tile_size
    )
    locs = choose_locations(rng, grid, how_many)
    tiles = get_tiles(
        reader,
        locs,
        level0,
        adjusted,
        tile_size,
        best_level,
        rng=rng,
        random_shift=random_shift,
        stats=stats,
    )
    return tiles, locs
