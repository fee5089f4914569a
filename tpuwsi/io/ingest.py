"""ctypes bindings to the native C++ tile-ingest library.

The native side (native/tileingest/) replaces the reference's OpenSlide +
DataLoader-worker hot path (SURVEY §2.11, §3.2): a libtiff/libjpeg pyramidal
reader with a multi-threaded batch extraction pool that decodes, crops, and
bilinearly resizes tiles directly into numpy buffers.

Build: ``cmake -S native -B native/build -G Ninja && ninja -C native/build``.
Everything degrades gracefully to the pure-Python readers when the library
is absent.
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

from tpuwsi.io.slide_readers import SlideReader

_LIB_PATHS = [
    # the explicit override must WIN over a (possibly stale) repo-local
    # build — listed first
    os.environ.get("TPUWSI_TILEINGEST_LIB", ""),
    os.path.join(os.path.dirname(__file__), "..", "..", "native", "build",
                 "libtileingest.so"),
    # packaged location (pip install): native/build.sh copies the built
    # library into tpuwsi/native_lib/, which pyproject ships as package data
    os.path.join(os.path.dirname(__file__), "..", "native_lib",
                 "libtileingest.so"),
]

_lib = None


class _TiRequest(ctypes.Structure):
    _fields_ = [
        ("slide", ctypes.c_int32),
        ("level", ctypes.c_int32),
        ("x", ctypes.c_int64),
        ("y", ctypes.c_int64),
        ("adjusted_size", ctypes.c_int32),
        ("out_size", ctypes.c_int32),
        ("index", ctypes.c_int64),
    ]


def _load():
    global _lib
    if _lib is not None:
        return _lib
    for path in _LIB_PATHS:
        if path and os.path.isfile(path):
            lib = ctypes.CDLL(os.path.abspath(path))
            lib.ti_open.argtypes = [ctypes.c_char_p]
            lib.ti_open.restype = ctypes.c_int
            lib.ti_close.argtypes = [ctypes.c_int]
            lib.ti_levels.argtypes = [ctypes.c_int]
            lib.ti_levels.restype = ctypes.c_int
            lib.ti_level_dims.argtypes = [
                ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ]
            lib.ti_level_dims.restype = ctypes.c_int
            lib.ti_level_downsample.argtypes = [ctypes.c_int, ctypes.c_int]
            lib.ti_level_downsample.restype = ctypes.c_double
            lib.ti_read_region.argtypes = [
                ctypes.c_int, ctypes.c_int, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint8),
            ]
            lib.ti_read_region.restype = ctypes.c_int
            lib.ti_pool_start.argtypes = [ctypes.c_int]
            lib.ti_extract_batch.argtypes = [
                ctypes.POINTER(_TiRequest), ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8),
            ]
            lib.ti_extract_batch.restype = ctypes.c_int
            lib.ti_write_synthetic.argtypes = [
                ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int, ctypes.c_int, ctypes.c_uint32,
            ]
            lib.ti_write_synthetic.restype = ctypes.c_int
            if hasattr(lib, "ti_write_synthetic_svs"):
                lib.ti_write_synthetic_svs.argtypes = (
                    lib.ti_write_synthetic.argtypes
                )
                lib.ti_write_synthetic_svs.restype = ctypes.c_int
            if hasattr(lib, "ti_write_synthetic_mrxs"):
                lib.ti_write_synthetic_mrxs.argtypes = (
                    lib.ti_write_synthetic.argtypes
                )
                lib.ti_write_synthetic_mrxs.restype = ctypes.c_int
            if hasattr(lib, "ti_transcode"):
                lib.ti_transcode.argtypes = [
                    ctypes.c_char_p, ctypes.c_char_p,
                    ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ]
                lib.ti_transcode.restype = ctypes.c_int
            _lib = lib
            return _lib
    raise OSError("libtileingest.so not built (see tpuwsi/io/ingest.py)")


def native_available() -> bool:
    try:
        _load()
        return True
    except OSError:
        return False


def restart_pool(n_threads: int = 0):
    """Stop and restart the global decode pool with a new size. ti_pool_start
    is a no-op while the pool runs (by design: racing resizes under load are
    a hazard), so benchmarks sweeping pool sizes must restart explicitly.
    Safe only when no extract call is in flight."""
    lib = _load()
    lib.ti_pool_stop()
    lib.ti_pool_start(n_threads)


def write_synthetic_slide(path: str, width: int, height: int, levels: int = 3,
                          tile: int = 256, seed: int = 0):
    rc = _load().ti_write_synthetic(
        path.encode(), width, height, levels, tile, seed
    )
    if rc != 0:
        raise IOError(f"ti_write_synthetic failed ({rc})")


def write_synthetic_svs_layout(path: str, width: int, height: int,
                               levels: int = 3, tile: int = 256,
                               seed: int = 0):
    """Synthetic slide with the real Aperio SVS directory ordering (strip
    thumbnail at dir 1, label/macro pages) for level-detection tests."""
    rc = _load().ti_write_synthetic_svs(
        path.encode(), width, height, levels, tile, seed
    )
    if rc != 0:
        raise IOError(f"ti_write_synthetic_svs failed ({rc})")


def write_synthetic_mrxs(path: str, width: int, height: int, levels: int = 3,
                         tile: int = 256, seed: int = 0):
    """Synthetic MIRAX slide (.mrxs stub + sibling data directory with
    Slidedat.ini / Index.dat / Data0000.dat, JPEG tiles, camera-position
    buffer with real overlaps) for .mrxs reader tests (native/tileingest/
    mirax.cc)."""
    rc = _load().ti_write_synthetic_mrxs(
        path.encode(), width, height, levels, tile, seed
    )
    if rc != 0:
        raise IOError(f"ti_write_synthetic_mrxs failed ({rc})")


def transcode_slide(src: str, dst: str, tile: int = 256, quality: int = 90,
                    n_threads: int = 0):
    """Offline one-shot transcode of any supported slide into a tiled
    pyramidal JPEG TIFF (BigTIFF), copying every source pyramid level.

    The MIRAX mitigation (BENCH.md): native .mrxs decode runs ~3.5x slower
    per core than tiled TIFF (mosaic decode amplification), so CARMEL-class
    cohorts are transcoded ONCE and then ingest at the TIFF rate every
    epoch. Reference equivalent: OpenSlide re-pays the mosaic cost on every
    read_region (utils.py:176). On failure no partial output is left."""
    rc = _load().ti_transcode(
        src.encode(), dst.encode(), int(tile), int(quality), int(n_threads)
    )
    if rc != 0:
        raise IOError(f"ti_transcode failed ({rc}) for {src}")


class CTileReader(SlideReader):
    """SlideReader backed by the native library (tiled TIFF / SVS)."""

    def __init__(self, path: str):
        lib = _load()
        self._lib = lib
        self._id = lib.ti_open(path.encode())
        if self._id < 0:
            raise IOError(f"ti_open failed for {path}")
        self.path = path
        n = lib.ti_levels(self._id)
        dims: List[Tuple[int, int]] = []
        downs: List[float] = []
        for lvl in range(n):
            w = ctypes.c_int64()
            h = ctypes.c_int64()
            lib.ti_level_dims(self._id, lvl, ctypes.byref(w), ctypes.byref(h))
            dims.append((w.value, h.value))
            downs.append(lib.ti_level_downsample(self._id, lvl))
        self.dimensions = dims[0]
        self.level_downsamples = downs
        self._level_dims = dims

    def read_region(self, location, level, size):
        x, y = location
        w, h = size
        out = np.empty((h, w, 3), dtype=np.uint8)
        rc = self._lib.ti_read_region(
            self._id, level, x, y, w, h,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        if rc != 0:
            raise IOError(f"ti_read_region failed ({rc})")
        return out

    def close(self):
        if self._id >= 0:
            self._lib.ti_close(self._id)
            self._id = -1


class NativeBatchExtractor:
    """Threaded batch tile extraction straight into one numpy buffer.

    This is the production ingest path: one call per training batch, decode +
    resize parallelised in C++, output ready for ``jax.device_put``.
    """

    def __init__(self, n_threads: int = 0):
        self._lib = _load()
        self._lib.ti_pool_start(n_threads)
        self.failures = 0

    def extract(
        self,
        requests: Sequence[Tuple[CTileReader, int, int, int, int]],
        out_size: int,
        out: Optional[np.ndarray] = None,
    ) -> np.ndarray:
        """requests: (reader, level, x, y, adjusted_size) per tile; x/y are
        level-0 coords. Returns (N, out_size, out_size, 3) uint8."""
        n = len(requests)
        if out is None:
            out = np.empty((n, out_size, out_size, 3), dtype=np.uint8)
        reqs = (_TiRequest * n)()
        for i, (reader, level, x, y, adjusted) in enumerate(requests):
            reqs[i] = _TiRequest(
                slide=reader._id, level=level, x=int(x), y=int(y),
                adjusted_size=int(adjusted), out_size=int(out_size),
                index=i,
            )
        failed = self._lib.ti_extract_batch(
            reqs, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        )
        self.failures += int(failed)
        return out
