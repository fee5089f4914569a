"""Slide readers: a uniform pyramidal read_region interface.

TPU-native replacement layer for OpenSlide (reference: utils.py:176
``slide.read_region``, datasets.py:402 ``openslide.open_slide``). Backends:

- ``OpenSlideReader`` — thin adapter if the openslide package is installed.
- ``ImageSlideReader`` — plain images (PNG/JPEG/TIFF) via PIL; single-level
  pyramid. Covers TMA jpg-cores (datasets.py:471-478) and test fixtures.
- ``CTileReader`` — the native C++ tile-ingest library (tpuwsi.io.ingest):
  multi-threaded tiled-TIFF decode. Used automatically for .tif/.svs when the
  library is built.
- ``SyntheticSlideReader`` — deterministic procedural slide for tests/bench.

All readers return HWC uint8 RGB numpy arrays.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import numpy as np

try:  # optional native/openslide backends
    import openslide  # type: ignore

    HAVE_OPENSLIDE = True
except Exception:  # pragma: no cover
    openslide = None
    HAVE_OPENSLIDE = False


class SlideReader:
    """Interface: dimensions (w, h) at level 0, level_downsamples, read_region."""

    dimensions: Tuple[int, int]
    level_downsamples: Sequence[float]

    def read_region(
        self, location: Tuple[int, int], level: int, size: Tuple[int, int]
    ) -> np.ndarray:
        """location is (x, y) in LEVEL-0 coordinates (OpenSlide convention);
        size is (w, h) at the requested level. Returns uint8 (h, w, 3)."""
        raise NotImplementedError

    def close(self):
        pass


class OpenSlideReader(SlideReader):
    def __init__(self, path: str):
        self._slide = openslide.open_slide(path)
        self.dimensions = self._slide.dimensions
        self.level_downsamples = list(self._slide.level_downsamples)
        self.path = path
        # scan-bounds origin (mrxs): the reference subtracts
        # PROPERTY_NAME_BOUNDS_X/Y before indexing the QuPath loan mask
        # (utils.py:189-192) — without this, loan labels on bounded slides
        # read the wrong mask region. (0, 0) when the properties are absent;
        # the native MIRAX reader already normalizes its origin (mirax.cc).
        props = self._slide.properties
        self.bounds = (
            int(props.get("openslide.bounds-x", 0) or 0),
            int(props.get("openslide.bounds-y", 0) or 0),
        )

    def read_region(self, location, level, size):
        img = self._slide.read_region(location, level, size).convert("RGB")
        return np.asarray(img, dtype=np.uint8)

    def close(self):
        self._slide.close()


class ImageSlideReader(SlideReader):
    """Whole image held in memory; single pyramid level."""

    def __init__(self, path_or_array, mirror_bgr: bool = False):
        if isinstance(path_or_array, np.ndarray):
            arr = path_or_array
            self.path = "<array>"
        else:
            from PIL import Image

            Image.MAX_IMAGE_PIXELS = None
            arr = np.asarray(Image.open(path_or_array).convert("RGB"))
            self.path = str(path_or_array)
        if mirror_bgr:
            # cv2.imread-parity (BGR) for the TMA path; the 'Amir' norm bank
            # is the channel-reversed 'Ron' bank (transformations.py:108,115).
            arr = arr[..., ::-1]
        self._arr = np.ascontiguousarray(arr, dtype=np.uint8)
        h, w = self._arr.shape[:2]
        self.dimensions = (w, h)
        self.level_downsamples = [1.0]

    def read_region(self, location, level, size):
        assert level == 0
        x, y = location
        w, h = size
        out = np.zeros((h, w, 3), dtype=np.uint8)
        src = self._arr[max(y, 0) : y + h, max(x, 0) : x + w]
        out[: src.shape[0], : src.shape[1]] = src
        return out


class SyntheticSlideReader(SlideReader):
    """Deterministic procedural pyramid for tests and benchmarks."""

    def __init__(self, width: int = 4096, height: int = 4096, levels: int = 3,
                 seed: int = 0):
        self.dimensions = (width, height)
        self.level_downsamples = [float(2 ** i) for i in range(levels)]
        self._seed = seed

    def read_region(self, location, level, size):
        x, y = location
        w, h = size
        ds = int(self.level_downsamples[level])
        xs = (x // ds + np.arange(w)) % 251
        ys = (y // ds + np.arange(h)) % 241
        r = (xs[None, :] * 3 + ys[:, None] * 7 + self._seed) % 256
        g = (xs[None, :] * 5 + ys[:, None] * 11 + self._seed) % 256
        b = (xs[None, :] * 13 + ys[:, None] * 2 + self._seed) % 256
        return np.stack([r, g, b], axis=-1).astype(np.uint8)


def open_slide(path: str, prefer_native: bool = True) -> SlideReader:
    """Pick a reader for the file. Native C++ ingest when available:
    TIFF-container formats (tiled AND striped layouts, which covers
    .svs/.tif and NDPI-class striped-JPEG slides; JPEG/LZW/deflate via
    libtiff and Aperio JP2K 33003/33005 via libopenjp2 — see
    native/tileingest/jp2k.cc) and MIRAX .mrxs (the CARMEL cohorts,
    datasets.py:1083-1086; native/tileingest/mirax.cc parses
    Slidedat.ini/Index.dat and stitches the camera mosaic from the
    position buffer). Then openslide, then PIL.
    """
    ext = os.path.splitext(path)[1].lower()
    native_state = "is disabled (prefer_native=False)"
    if prefer_native and ext in (".tif", ".tiff", ".svs", ".ndpi", ".mrxs"):
        native_state = "failed to import (tpuwsi.io.ingest broken?)"
        try:
            from tpuwsi.io.ingest import CTileReader, native_available

            if native_available():
                native_state = "failed to parse it"
                return CTileReader(path)
            native_state = "is not built (run native/build.sh)"
        except Exception:
            # fall through: the native backend could not parse this
            # particular file (e.g. an NDPI variant with out-of-spec JPEG
            # dims, or a PNG/BMP24 MIRAX variant) — try the openslide / PIL
            # fallbacks below. native_state already names the phase that
            # failed (import vs parse vs not-built) for the raised errors.
            pass
    if HAVE_OPENSLIDE and ext in (".svs", ".mrxs", ".ndpi", ".tif", ".tiff"):
        return OpenSlideReader(path)
    if ext == ".mrxs":
        # MIRAX is directory-based — PIL on the .mrxs stub would be garbage.
        raise RuntimeError(
            f"cannot read {path}: the native MIRAX reader {native_state} "
            "(JPEG tile format and VIMSLIDE_POSITION_BUFFER/grid positions "
            "are supported; PNG/BMP24 and zlib StitchingIntensityLayer "
            "variants are not) and openslide is not installed. Build "
            "native/ (build.sh) or install openslide-python + libopenslide."
        )
    if ext in (".svs", ".ndpi"):
        # Pyramidal proprietary containers must never fall through to PIL:
        # PIL reads page 0 of whatever it can parse (or dies on the
        # decompression-bomb limit) — training on that is silent garbage.
        raise RuntimeError(
            f"cannot read {path}: the native reader {native_state} and "
            "openslide is not installed. Build native/ (build.sh) or install "
            "openslide-python + libopenslide."
        )
    if ext in (".tif", ".tiff"):
        # Plain single-page TIFFs (TMA cores, fixtures) are a legitimate PIL
        # path, but a MULTI-PAGE tif is a WSI pyramid (ABCTB_TIF-class
        # cohorts) — reading page 0 alone silently trains at the wrong
        # magnification.
        from PIL import Image

        Image.MAX_IMAGE_PIXELS = None
        with Image.open(path) as probe:
            if getattr(probe, "n_frames", 1) > 1:
                raise RuntimeError(
                    f"cannot read {path}: multi-page (pyramidal) TIFF, but "
                    f"the native reader {native_state} and openslide is not "
                    "installed — PIL would read only page 0. Build native/ "
                    "(build.sh) or install openslide-python + libopenslide."
                )
    return ImageSlideReader(path)
