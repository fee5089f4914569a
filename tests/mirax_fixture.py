"""Python-side MIRAX (.mrxs) fixture generator for reader edge cases the C++
synthetic writer (divisions=1, all cameras present, one data file) does not
cover: CameraImageDivisionsPerSide > 1, absent cameras (position-buffer
flag = 0), tiles split across multiple Data files, PNG/BMP24 tile payloads,
and the MIRAX >= 2.2 zlib-compressed StitchingIntensityLayer position
buffer.

Writes the same on-disk format native/tileingest/mirax.cc parses:
Slidedat.ini + Index.dat + Data%04d.dat, tile payloads via PIL.
"""

import io
import os
import struct
import zlib

import numpy as np
from PIL import Image


def pattern(xs, ys, seed):
    gx, gy = np.meshgrid(np.asarray(xs), np.asarray(ys))
    return np.stack(
        [(gx // 7 + seed) % 256, (gy // 7 + seed * 3) % 256,
         ((gx + gy) // 11 + seed * 5) % 256],
        axis=-1,
    ).astype(np.uint8)


def write_mirax(
    path,
    cam_x=3,
    cam_y=2,
    divisions=2,
    tile=64,
    overlap=8,
    levels=2,
    seed=5,
    absent_cameras=(),
    n_data_files=2,
    image_format="JPEG",
    zlib_position=False,
):
    """Camera grid cam_x x cam_y, each camera divided into divisions² stored
    tiles of `tile` px; cameras overlap by `overlap` level-0 px. Tile content
    is the analytic `pattern` at absolute level-0 coordinates, so stitched
    reads must reproduce it everywhere (JPEG tolerance; PNG/BMP24 are
    lossless, so reads must match EXACTLY). `image_format` is one of
    JPEG/PNG/BMP24 (the three payloads real scanners emit); `zlib_position`
    stores the camera positions as the MIRAX >= 2.2 zlib-compressed
    StitchingIntensityLayer blob instead of the raw VIMSLIDE buffer.
    Returns the .mrxs stub path."""
    base = os.path.splitext(path)[0]
    os.makedirs(base, exist_ok=True)
    gridw = cam_x * divisions
    gridh = cam_y * divisions
    cam_adv = divisions * tile - overlap  # camera advance, level-0 px
    slide_id = f"PYSYNTH-{seed:08x}"

    def cam_pos(cx, cy):
        return cx * cam_adv, cy * cam_adv

    data = [bytearray() for _ in range(n_data_files)]
    pil_format = {"JPEG": "JPEG", "PNG": "PNG", "BMP24": "BMP"}[image_format]

    def add_image(arr, fileno):
        buf = io.BytesIO()
        if pil_format == "JPEG":
            Image.fromarray(arr).save(buf, format="JPEG", quality=95)
        else:
            # PIL writes RGB BMPs as 24-bit uncompressed bottom-up — exactly
            # the MIRAX BMP24 payload; PNG as 8-bit color-type-2 RGB.
            Image.fromarray(arr).save(buf, format=pil_format)
        off = len(data[fileno])
        data[fileno] += buf.getvalue()
        return off, len(buf.getvalue())

    # zoom levels: level z stores one JPEG per 2^z x 2^z grid block
    recs = []  # per level: list of (image_number, offset, length, fileno)
    for z in range(levels):
        ds = 1 << z
        lvl = []
        for gy in range(0, gridh, ds):
            for gx in range(0, gridw, ds):
                cx, cy = gx // divisions, gy // divisions
                if (cx, cy) in absent_cameras:
                    continue
                px, py = cam_pos(cx, cy)
                px += (gx % divisions) * tile
                py += (gy % divisions) * tile
                arr = pattern(
                    px + np.arange(tile) * ds, py + np.arange(tile) * ds, seed
                )
                fileno = (gy * gridw + gx) % n_data_files
                off, length = add_image(arr, fileno)
                lvl.append((gy * gridw + gx, off, length, fileno))
        recs.append(lvl)

    # position buffer: 9 bytes per camera, row-major, flag=0 for absent;
    # zlib-compressed when emulating a MIRAX >= 2.2 export
    pos = bytearray()
    for cy in range(cam_y):
        for cx in range(cam_x):
            present = (cx, cy) not in absent_cameras
            x, y = cam_pos(cx, cy)
            pos += struct.pack("<Bii", 1 if present else 0, x, y)
    if zlib_position:
        pos = bytearray(zlib.compress(bytes(pos)))
    pos_file = 0
    pos_off = len(data[pos_file])
    data[pos_file] += pos

    # Index.dat
    idx = bytearray()
    idx += b"01.02"
    idx += slide_id.encode()
    root_ptrs_at = len(idx)
    idx += struct.pack("<ii", 0, 0)  # placeholders
    hier_root = len(idx)
    idx += b"\x00" * 4 * levels
    nonhier_root = len(idx)
    idx += b"\x00" * 4
    for z in range(levels):
        struct.pack_into("<i", idx, hier_root + 4 * z, len(idx))
        idx += struct.pack("<ii", len(recs[z]), 0)
        for img, off, length, fileno in recs[z]:
            idx += struct.pack("<iiii", img, off, length, fileno)
    struct.pack_into("<i", idx, nonhier_root, len(idx))
    idx += struct.pack("<ii", 1, 0)
    idx += struct.pack("<iiii", 0, pos_off, len(pos), pos_file)
    struct.pack_into("<ii", idx, root_ptrs_at, hier_root, nonhier_root)

    # Slidedat.ini
    lines = [
        "[GENERAL]",
        "SLIDE_VERSION = 1.9",
        f"SLIDE_ID = {slide_id}",
        f"IMAGENUMBER_X = {cam_x}",
        f"IMAGENUMBER_Y = {cam_y}",
        f"CameraImageDivisionsPerSide = {divisions}",
        "[HIERARCHICAL]",
        "HIER_COUNT = 1",
        "NONHIER_COUNT = 1",
        "INDEXFILE = Index.dat",
        "HIER_0_NAME = Slide zoom level",
        f"HIER_0_COUNT = {levels}",
    ]
    for z in range(levels):
        lines += [
            f"HIER_0_VAL_{z} = ZoomLevel_{z}",
            f"HIER_0_VAL_{z}_SECTION = LAYER_0_LEVEL_{z}_SECTION",
        ]
    if zlib_position:
        lines += [
            "NONHIER_0_NAME = StitchingIntensityLayer",
            "NONHIER_0_COUNT = 1",
            "NONHIER_0_VAL_0 = StitchingIntensityLevel",
        ]
    else:
        lines += [
            "NONHIER_0_NAME = VIMSLIDE_POSITION_BUFFER",
            "NONHIER_0_COUNT = 1",
            "NONHIER_0_VAL_0 = default",
        ]
    for z in range(levels):
        lines += [
            f"[LAYER_0_LEVEL_{z}_SECTION]",
            f"DIGITIZER_WIDTH = {tile}",
            f"DIGITIZER_HEIGHT = {tile}",
            f"OVERLAP_X = {float(overlap)}",
            f"OVERLAP_Y = {float(overlap)}",
            f"IMAGE_FORMAT = {image_format}",
        ]
    lines += ["[DATAFILE]", f"FILE_COUNT = {n_data_files}"]
    for i in range(n_data_files):
        lines += [f"FILE_{i} = Data{i:04d}.dat"]

    with open(os.path.join(base, "Slidedat.ini"), "w") as f:
        f.write("\n".join(lines) + "\n")
    with open(os.path.join(base, "Index.dat"), "wb") as f:
        f.write(idx)
    for i in range(n_data_files):
        with open(os.path.join(base, f"Data{i:04d}.dat"), "wb") as f:
            f.write(data[i])
    with open(path, "w") as f:
        f.write("MIRAX python fixture stub\n")
    return path
