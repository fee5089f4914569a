"""Offline slide transcode CLI — the MIRAX ingest mitigation.

Native ``.mrxs`` decode runs ~3.5x slower per core than tiled TIFF (mosaic
decode amplification: a 512-px region read touches up to 9 overlapping
camera tiles — BENCH.md "MIRAX native backend"). The reference re-pays that
cost on EVERY ``read_region`` of every epoch (OpenSlide behind
utils.py:176); this tool pays it exactly once, walking each slide through
the native reader and writing a tiled pyramidal JPEG TIFF (BigTIFF) that
then ingests at the tiled-TIFF rate:

  python -m tpuwsi.cli.transcode CARMEL1/*.mrxs --output CARMEL1_tiff/

Every source pyramid level is copied; downstream tooling (grids, xlsx
metadata) only needs the ``file`` column renamed from ``.mrxs`` to
``.tiff``. Works on any format the native reader opens (MIRAX/SVS/NDPI/
TIFF), so it also normalizes mixed cohorts.
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("tpuwsi offline slide transcode")
    p.add_argument("slides", nargs="+", help="source slide paths")
    p.add_argument("--output", required=True,
                   help="output directory for the .tiff files")
    p.add_argument("--tile", default=256, type=int,
                   help="output tile size (multiple of 16; default 256 — "
                        "the cohort tile geometry)")
    p.add_argument("--quality", default=90, type=int,
                   help="JPEG quality (default 90)")
    p.add_argument("--threads", default=0, type=int,
                   help="decode threads (0 = hardware concurrency)")
    p.add_argument("--force", action="store_true",
                   help="re-transcode even when the output already exists")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from tpuwsi.io.ingest import native_available, transcode_slide

    if not native_available():
        print("native tileingest library not built (bash native/build.sh)",
              file=sys.stderr)
        return 2
    os.makedirs(args.output, exist_ok=True)
    # Same basename from different directories would silently overwrite (or
    # skip-as-exists) — a cohort slide vanishing without an error. Refuse.
    names = [os.path.splitext(os.path.basename(s))[0] for s in args.slides]
    dupes = {n for n in names if names.count(n) > 1}
    if dupes:
        print(f"duplicate output basenames across inputs: {sorted(dupes)} — "
              f"transcode colliding slides in separate --output dirs",
              file=sys.stderr)
        return 2
    failures = 0
    for src in args.slides:
        base = os.path.splitext(os.path.basename(src))[0]
        dst = os.path.join(args.output, base + ".tiff")
        if os.path.exists(dst) and not args.force:
            print(f"skip {src} (exists: {dst})")
            continue
        t0 = time.perf_counter()
        try:
            transcode_slide(src, dst, tile=args.tile, quality=args.quality,
                            n_threads=args.threads)
        except OSError as e:
            print(f"FAIL {src}: {e}", file=sys.stderr)
            failures += 1
            continue
        mb = os.path.getsize(dst) / 1e6
        print(f"ok   {src} -> {dst}  {mb:.1f} MB  "
              f"{time.perf_counter() - t0:.1f}s")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
