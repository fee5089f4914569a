#!/usr/bin/env python
"""Native tile-ingest throughput benchmark.

Measures the C++ batch extractor (decode JPEG-compressed pyramid tiles +
bilinear resize to 256²) against the pure-Python PIL path — the reference's
data-pipeline hot spot (SURVEY §3.2, hard part #1: host ingest rate).

Usage: python scripts/bench_ingest.py [n_tiles] [n_threads] [tif|mrxs]

The mrxs mode benches the MIRAX backend (native/tileingest/mirax.cc):
camera-mosaic stitching means each 512² read touches up to 9 overlapping
JPEG tiles, so it is the worst-case decode amplification of the formats.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpuwsi.io.ingest import (  # noqa: E402
    CTileReader,
    NativeBatchExtractor,
    native_available,
    write_synthetic_slide,
)


def main():
    if not native_available():
        print("libtileingest.so not built — run native/build.sh")
        return
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    threads = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    fmt = sys.argv[3] if len(sys.argv) > 3 else "tif"
    if fmt == "mrxs":
        from tpuwsi.io.ingest import write_synthetic_mrxs

        path = "/tmp/ingest_bench.mrxs"
        write_synthetic_mrxs(path, 8192, 8192, levels=3, tile=256, seed=3)
    elif fmt == "mrxs2tif":
        # the offline-transcode mitigation: one-shot .mrxs -> tiled TIFF
        # (tpuwsi.cli.transcode), then ingest at the tiled-TIFF rate
        from tpuwsi.io.ingest import transcode_slide, write_synthetic_mrxs

        src = "/tmp/ingest_bench.mrxs"
        path = "/tmp/ingest_bench_transcoded.tiff"
        write_synthetic_mrxs(src, 8192, 8192, levels=3, tile=256, seed=3)
        t0 = time.perf_counter()
        transcode_slide(src, path, tile=256, quality=90, n_threads=threads)
        print(f"one-time transcode: {time.perf_counter() - t0:.1f}s "
              f"({os.path.getsize(path) / 1e6:.0f} MB)")
    else:
        path = "/tmp/ingest_bench.tif"
        write_synthetic_slide(path, 8192, 8192, levels=3, tile=256, seed=3)
    reader = CTileReader(path)
    rng = np.random.default_rng(0)
    xs = rng.integers(0, 8192 - 512, size=n)
    ys = rng.integers(0, 8192 - 512, size=n)

    ex = NativeBatchExtractor(n_threads=threads)
    reqs = [(reader, 0, int(x), int(y), 512) for x, y in zip(xs, ys)]
    # warmup
    ex.extract(reqs[:16], out_size=256)
    t0 = time.perf_counter()
    out = ex.extract(reqs, out_size=256)
    dt = time.perf_counter() - t0
    print(
        f"native ingest: {n} tiles (512² read → 256² out) in {dt:.3f}s "
        f"= {n/dt:.1f} tiles/s (failures: {ex.failures})"
    )

    # PIL reference path on the same tiles
    from PIL import Image

    t0 = time.perf_counter()
    for x, y in zip(xs[:64], ys[:64]):
        tile = reader.read_region((int(x), int(y)), 0, (512, 512))
        Image.fromarray(tile).resize((256, 256))
    dt_py = (time.perf_counter() - t0) / 64 * n
    print(f"python path (extrapolated): {n/dt_py:.1f} tiles/s")
    print(f"speedup: {dt_py/dt:.2f}x")
    reader.close()


def thread_scaling(n: int = 256, pool_sizes=(1, 2, 4, 8, 16)):
    """tiles/s vs pool size (VERDICT r2 #5b): measures how the native pool
    scales with decode threads. On a 1-core host the curve is flat by
    construction — run on a many-core host to see the per-core model; the
    per-thread efficiency column makes saturation obvious either way."""
    import os as _os

    path = "/tmp/ingest_bench.tif"
    write_synthetic_slide(path, 8192, 8192, levels=3, tile=256, seed=3)
    reader = CTileReader(path)
    rng = np.random.default_rng(0)
    xs = rng.integers(0, 8192 - 512, size=n)
    ys = rng.integers(0, 8192 - 512, size=n)
    reqs = [(reader, 0, int(x), int(y), 512) for x, y in zip(xs, ys)]
    ncpu = _os.cpu_count() or 1
    print(f"thread-scaling sweep ({ncpu} host cores, {n} tiles/point):")
    print(f"{'threads':>8s} {'tiles/s':>9s} {'per-thread':>11s} {'eff':>6s}")
    from tpuwsi.io.ingest import restart_pool

    base = None
    for t in pool_sizes:
        restart_pool(t)
        ex = NativeBatchExtractor(n_threads=t)
        ex.extract(reqs[:16], out_size=256)  # warm
        t0 = time.perf_counter()
        ex.extract(reqs, out_size=256)
        rate = n / (time.perf_counter() - t0)
        base = base or rate
        eff = rate / (base * t)
        print(f"{t:8d} {rate:9.1f} {rate / t:11.1f} {eff:6.2f}")
    reader.close()


def feed_table(n: int = 512, step_tiles_per_sec: float = 962.0):
    """Host-ingest feasibility table (round-4 VERDICT item 4): measure the
    per-thread native ingest rate for each production format on THIS host,
    and print the cores needed to sustain the SSL step's measured source
    consumption (default 962 tiles/s = 7,697 views/s / 8).

    The ring-fed overlap demonstration (scripts/bench_overlap.py) is
    link-bound on the tunneled bench host; this table is the per-core
    measurement that the cores-needed model rests on."""
    from tpuwsi.io.ingest import (
        restart_pool,
        transcode_slide,
        write_synthetic_mrxs,
        write_synthetic_svs_layout,
    )

    paths = {}
    write_synthetic_slide("/tmp/feed_bench.tif", 8192, 8192, levels=3,
                          tile=256, seed=3)
    paths["tiled TIFF"] = "/tmp/feed_bench.tif"
    write_synthetic_svs_layout("/tmp/feed_bench.svs", 8192, 8192, levels=3,
                               tile=256, seed=3)
    paths["SVS (Aperio)"] = "/tmp/feed_bench.svs"
    write_synthetic_mrxs("/tmp/feed_bench.mrxs", 8192, 8192, levels=3,
                         tile=256, seed=3)
    paths["MIRAX (mosaic)"] = "/tmp/feed_bench.mrxs"
    transcode_slide("/tmp/feed_bench.mrxs", "/tmp/feed_bench_tc.tiff",
                    tile=256, quality=90, n_threads=1)
    paths["MIRAX->transcoded TIFF"] = "/tmp/feed_bench_tc.tiff"

    rng = np.random.default_rng(0)
    xs = rng.integers(0, 8192 - 512, size=n)
    ys = rng.integers(0, 8192 - 512, size=n)
    print(f"single-thread native ingest on this host "
          f"({os.cpu_count()} core(s)); target {step_tiles_per_sec:.0f} "
          f"source tiles/s (SSL step consumption):")
    print(f"{'format':>24s} {'tiles/s/thread':>15s} {'cores needed':>13s}")
    restart_pool(1)
    for name, path in paths.items():
        reader = CTileReader(path)
        reqs = [(reader, 0, int(x), int(y), 512) for x, y in zip(xs, ys)]
        ex = NativeBatchExtractor(n_threads=1)
        ex.extract(reqs[:16], out_size=256)
        t0 = time.perf_counter()
        ex.extract(reqs, out_size=256)
        rate = n / (time.perf_counter() - t0)
        print(f"{name:>24s} {rate:15.1f} "
              f"{step_tiles_per_sec / rate:13.1f}")
        reader.close()


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "scaling":
        thread_scaling(int(sys.argv[2]) if len(sys.argv) > 2 else 256)
    elif len(sys.argv) > 1 and sys.argv[1] == "feed":
        feed_table(
            int(sys.argv[2]) if len(sys.argv) > 2 else 512,
            float(sys.argv[3]) if len(sys.argv) > 3 else 962.0,
        )
    else:
        main()
