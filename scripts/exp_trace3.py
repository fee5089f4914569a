#!/usr/bin/env python
"""Round-3 device-trace comparison for the DINO SSL bench step.

Captures jax.profiler device traces of the full step at one or more batch
sizes and prints per-category time/bytes plus the top ops, so the b96→b128
flat-scaling pathology (BENCH.md) gets a per-op explanation instead of
another A/B guess.

Usage: python scripts/exp_trace3.py [batch ...]   (default: 96 128)
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import shutil
import sys
import time
from collections import defaultdict

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, "/root/repo")

from tpuwsi.core.compile import _SCHED_OPTS  # noqa: E402


def capture(batch_size: int, logdir: str):
    from bench import build

    state, step = build(batch_size)
    rng = jax.random.PRNGKey(1)
    imgs = np.random.randint(0, 255, (batch_size, 256, 256, 3), dtype=np.uint8)
    b = {"images": jnp.asarray(imgs)}
    step = step.lower(state, b, rng).compile(
        compiler_options=dict(_SCHED_OPTS)
    )
    state, m = step(state, b, rng)
    float(m["loss"])
    # timed steady-state
    t0 = time.perf_counter()
    for i in range(12):
        state, m = step(state, b, rng)
        if i % 4 == 3:
            float(m["loss"])
    float(m["loss"])
    dt = (time.perf_counter() - t0) / 12
    shutil.rmtree(logdir, ignore_errors=True)
    jax.profiler.start_trace(logdir)
    for _ in range(3):
        state, m = step(state, b, rng)
    float(m["loss"])
    jax.profiler.stop_trace()
    return dt


def parse(logdir: str):
    paths = glob.glob(os.path.join(logdir, "plugins/profile/*/*.trace.json.gz"))
    if not paths:
        raise FileNotFoundError(f"no trace under {logdir}")
    with gzip.open(paths[0], "rt") as f:
        trace = json.load(f)
    events = [
        e for e in trace["traceEvents"]
        if e.get("ph") == "X" and e.get("pid") == 3 and "args" in e
    ]
    return events


def analyze(events, n_steps=3):
    by_cat = defaultdict(lambda: [0.0, 0.0, 0])  # dur_ms, gbytes, count
    by_op = defaultdict(lambda: [0.0, 0.0, 0])
    total = 0.0
    for e in events:
        cat = e["args"].get("hlo_category", "?")
        name = e["args"].get("deduplicated_name") or e.get("name", "?")
        dur = e.get("dur", 0) / 1e3 / n_steps  # us → ms, per step
        gb = float(e["args"].get("bytes_accessed", 0) or 0) / 1e9 / n_steps
        by_cat[cat][0] += dur
        by_cat[cat][1] += gb
        by_cat[cat][2] += 1
        by_op[(cat, name)][0] += dur
        by_op[(cat, name)][1] += gb
        by_op[(cat, name)][2] += 1
        total += dur
    # device busy span & gaps
    ts = sorted((e["ts"], e["ts"] + e["dur"]) for e in events)
    span = (ts[-1][1] - ts[0][0]) / 1e3 / n_steps
    busy_end = 0
    gap = 0.0
    for s, t in ts:
        if s > busy_end:
            gap += s - busy_end
        busy_end = max(busy_end, t)
    gap = gap / 1e3 / n_steps
    return by_cat, by_op, total, span, gap


def report(tag, dt, by_cat, by_op, total, span, gap, top=25):
    print(f"\n=== {tag}: wall {dt*1e3:.1f} ms/step | trace sum-of-ops "
          f"{total:.1f} ms | span {span:.1f} ms | gaps {gap:.2f} ms ===")
    print(f"{'category':28s} {'ms':>8s} {'GB':>8s} {'GB/s':>7s} {'n':>5s}")
    for cat, (ms, gb, n) in sorted(by_cat.items(), key=lambda kv: -kv[1][0]):
        bw = gb / (ms / 1e3) if ms else 0
        print(f"{cat:28s} {ms:8.2f} {gb:8.2f} {bw:7.0f} {n:5d}")
    print(f"\ntop ops:")
    for (cat, name), (ms, gb, n) in sorted(
        by_op.items(), key=lambda kv: -kv[1][0]
    )[:top]:
        bw = gb / (ms / 1e3) if ms else 0
        print(f"  {ms:7.2f} ms {gb:7.2f} GB {bw:5.0f} GB/s x{n:3d} [{cat}] "
              f"{name[:90]}")


def main():
    batches = [int(a) for a in sys.argv[1:]] or [96, 128]
    for bsz in batches:
        logdir = f"/tmp/trace3_b{bsz}"
        dt = capture(bsz, logdir)
        events = parse(logdir)
        report(f"b{bsz}", dt, *analyze(events))


if __name__ == "__main__":
    main()
