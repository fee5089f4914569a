#!/usr/bin/env python
"""Ingest→device overlap benchmark (SURVEY §7 hard-part 1).

Feeds the headline DINO SSL step from the NATIVE tile-ingest path (C++
libtiff decode + resize over synthetic pyramidal slides) through a
background-thread prefetcher, and reports the SUSTAINED source tiles/s with
the chip training — proving the host pipeline keeps up with the device rate
(the 10k-views north star implies ≥1,250 source tiles/s of 256² ingest).

Usage: python scripts/bench_overlap.py [batch] [n_steps] [--ring]

--ring (VERDICT r2 #5a): pre-decode a ring of batches so decode supply is
unbounded, then run the SAME overlapped loop — isolates the overlap
machinery (queue + device_put + dispatch) from decode throughput. If the
ring mode sustains ≥95% of the data-resident bench rate, the machinery is
sound and any shortfall in the live run is decode supply (host cores).
"""

from __future__ import annotations

import queue
import sys
import threading
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    from tpuwsi.io.ingest import (
        CTileReader,
        NativeBatchExtractor,
        native_available,
        write_synthetic_slide,
    )

    if not native_available():
        print("libtileingest.so not built — run native/build.sh")
        return
    args = [a for a in sys.argv[1:] if a != "--ring"]
    ring_mode = "--ring" in sys.argv
    batch = int(args[0]) if len(args) > 0 else 64
    n_steps = int(args[1]) if len(args) > 1 else 60

    # --- synthetic slide set (8 pyramidal JPEG TIFFs, 8k²) -----------------
    readers = []
    for i in range(8):
        path = f"/tmp/overlap_bench_{i}.tif"
        write_synthetic_slide(path, 8192, 8192, levels=3, tile=256, seed=i)
        readers.append(CTileReader(path))

    ex = NativeBatchExtractor(n_threads=0)
    rng = np.random.default_rng(0)

    def extract_batch():
        reqs = []
        for _ in range(batch):
            r = readers[rng.integers(len(readers))]
            x = int(rng.integers(0, 8192 - 512))
            y = int(rng.integers(0, 8192 - 512))
            reqs.append((r, 0, x, y, 512))  # 512² level-0 read → 256² tile
        return ex.extract(reqs, out_size=256)

    # pure ingest rate first (chip idle)
    extract_batch()
    t0 = time.perf_counter()
    for _ in range(10):
        extract_batch()
    ingest_rate = 10 * batch / (time.perf_counter() - t0)

    # --- device step ---------------------------------------------------------
    sys.path.insert(0, "/root/repo")
    from scripts.exp_ab import build

    state, step = build("base", batch)
    rng_dev = jax.random.PRNGKey(1)

    # warm up/compile
    state, m = step(state, {"images": jnp.asarray(extract_batch())}, rng_dev)
    float(m["loss"])

    # --- data-resident reference rate (chip-only ceiling) ------------------
    resident = jnp.asarray(extract_batch())
    t0 = time.perf_counter()
    for i in range(16):
        state, m = step(state, {"images": resident}, rng_dev)
        if i % 4 == 3:
            float(m["loss"])
    float(m["loss"])
    resident_rate = 16 * batch / (time.perf_counter() - t0)

    # --- overlapped loop: background ingest feeds a bounded queue ----------
    if ring_mode:
        # pre-decoded ring: decode supply is unbounded by construction
        ring = [extract_batch().copy() for _ in range(8)]
        ring_i = [0]

        def extract_batch():  # noqa: F811 — deliberate shadow for the ring
            ring_i[0] = (ring_i[0] + 1) % len(ring)
            return ring[ring_i[0]]

    q: queue.Queue = queue.Queue(maxsize=4)
    stop = threading.Event()

    def producer():
        while not stop.is_set():
            arr = extract_batch()
            try:
                q.put(arr, timeout=1.0)
            except queue.Full:
                continue

    threads = [threading.Thread(target=producer, daemon=True) for _ in range(2)]
    for t in threads:
        t.start()

    t0 = time.perf_counter()
    for i in range(n_steps):
        arr = q.get()
        state, m = step(state, {"images": jnp.asarray(arr)}, rng_dev)
        if i % 4 == 3:
            float(m["loss"])
    float(m["loss"])
    dt = time.perf_counter() - t0
    stop.set()
    # Drain so producers blocked on q.put see stop, then join BEFORE closing
    # readers — a producer mid-extract must not race ti_close.
    while not q.empty():
        q.get_nowait()
    for t in threads:
        t.join(timeout=10.0)

    sustained = batch * n_steps / dt
    mode = "ring (pre-decoded)" if ring_mode else "live decode"
    print(
        f"[{mode}] pure ingest: {ingest_rate:.1f} tiles/s | "
        f"data-resident: {resident_rate:.1f} tiles/s | "
        f"overlapped train: {sustained:.1f} source tiles/s "
        f"({sustained * 8:.0f} views/s, {sustained / resident_rate * 100:.1f}% "
        f"of resident) over {n_steps} steps (failures: {ex.failures})"
    )
    for r in readers:
        r.close()


if __name__ == "__main__":
    main()
