"""Synthetic Aperio-style JP2K SVS fixture: a classic little-endian tiled
TIFF whose tile data are raw JPEG-2000 codestreams (compression 33005 = RGB
"wavelet", 33003 = YCbCr "wavelet"), as written by Aperio scanners and read
by OpenSlide (reference: utils.py:176 read_region on JP2K cohorts).

PIL encodes the per-tile codestreams (lossless 5x3, raw J2K, no JP2 box);
the TIFF container is assembled by hand since no available encoder writes
the Aperio compression tags.
"""

from __future__ import annotations

import io
import struct

import numpy as np
from PIL import Image

SHORT, LONG = 3, 4


def _j2k_bytes(arr: np.ndarray) -> bytes:
    buf = io.BytesIO()
    Image.fromarray(arr).save(
        buf, format="JPEG2000", irreversible=False, no_jp2=True
    )
    return buf.getvalue()


def rgb_to_full_range_ycbcr(rgb: np.ndarray) -> np.ndarray:
    """Full-range JPEG YCbCr — the convention Aperio 33003 streams use and
    the native reader inverts (native/tileingest/jp2k.cc)."""
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return np.clip(np.stack([y, cb, cr], axis=-1).round(), 0, 255).astype(
        np.uint8
    )


def _entry(tag: int, typ: int, values, data_blocks, pos_of_next_block):
    """Pack one IFD entry; values that don't fit inline get an external
    block appended to data_blocks (whose file offset is assigned later via
    pos_of_next_block callbacks)."""
    fmt = "<H" if typ == SHORT else "<I"
    size = 2 if typ == SHORT else 4
    raw = b"".join(struct.pack(fmt, v) for v in values)
    if len(raw) <= 4:
        return struct.pack("<HHI", tag, typ, len(values)) + raw.ljust(4, b"\0")
    off = pos_of_next_block(len(raw))
    data_blocks.append(raw)
    return struct.pack("<HHII", tag, typ, len(values), off)


def write_jp2k_svs(path: str, img: np.ndarray, tile: int = 256,
                   compression: int = 33005, levels: int = 1) -> None:
    """Writes `img` (uint8 HxWx3, RGB for 33005 / YCbCr planes for 33003)
    as a `levels`-deep factor-2 pyramid of JP2K tiles."""
    out = io.BytesIO()
    out.write(struct.pack("<2sHI", b"II", 42, 0))
    next_patch = 4  # position of the pointer to the next IFD

    pyramid = [img]
    for _ in range(1, levels):
        prev = pyramid[-1]
        pyramid.append(
            np.asarray(
                Image.fromarray(prev).resize(
                    (prev.shape[1] // 2, prev.shape[0] // 2), Image.BILINEAR
                )
            )
        )

    photometric = 6 if compression == 33003 else 2
    for lv in pyramid:
        h, w = lv.shape[:2]
        ntx, nty = -(-w // tile), -(-h // tile)
        offsets, counts = [], []
        for ty in range(nty):
            for tx in range(ntx):
                t = np.zeros((tile, tile, 3), np.uint8)
                sub = lv[ty * tile:(ty + 1) * tile, tx * tile:(tx + 1) * tile]
                t[: sub.shape[0], : sub.shape[1]] = sub
                data = _j2k_bytes(t)
                if out.tell() % 2:
                    out.write(b"\0")
                offsets.append(out.tell())
                counts.append(len(data))
                out.write(data)

        # external value blocks land right after the tile data, before the IFD
        blocks: list[bytes] = []
        base = out.tell() + (out.tell() % 2)
        sizes: list[int] = []

        def next_off(nbytes, base=base, sizes=sizes):
            off = base + sum(s + (s % 2) for s in sizes)
            sizes.append(nbytes)
            return off

        entries = [
            _entry(256, LONG, [w], blocks, next_off),
            _entry(257, LONG, [h], blocks, next_off),
            _entry(258, SHORT, [8, 8, 8], blocks, next_off),
            _entry(259, SHORT, [compression], blocks, next_off),
            _entry(262, SHORT, [photometric], blocks, next_off),
            _entry(277, SHORT, [3], blocks, next_off),
            _entry(284, SHORT, [1], blocks, next_off),
            _entry(322, LONG, [tile], blocks, next_off),
            _entry(323, LONG, [tile], blocks, next_off),
            _entry(324, LONG, offsets, blocks, next_off),
            _entry(325, LONG, counts, blocks, next_off),
        ]
        if out.tell() % 2:
            out.write(b"\0")
        assert out.tell() == base
        for b in blocks:
            out.write(b)
            if len(b) % 2:
                out.write(b"\0")
        ifd_off = out.tell()
        buf = out.getbuffer()
        buf[next_patch:next_patch + 4] = struct.pack("<I", ifd_off)
        del buf
        out.seek(0, io.SEEK_END)
        out.write(struct.pack("<H", len(entries)))
        for e in entries:
            out.write(e)
        next_patch = out.tell()
        out.write(struct.pack("<I", 0))

    with open(path, "wb") as f:
        f.write(out.getvalue())
