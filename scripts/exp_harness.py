#!/usr/bin/env python
"""Shared full-step A/B harness for the exp_* scripts.

Builds the EXACT bench.py step (tuned config) with per-variant ViTConfig
overrides, runs it under the K-step scanned driver with the adopted
compiler flags, and prints ms/step + views/s per variant. Using bench.build
directly (instead of a hand-copied builder) means every A/B automatically
measures against the current adopted configuration (round-4 review
finding: two scripts had drifted copies of this builder).
"""

from __future__ import annotations

import importlib.util
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, "/root/repo")

FLAGS = {
    "xla_tpu_enable_latency_hiding_scheduler": "true",
    "xla_tpu_rwb_fusion": "false",
    "xla_jf_conv_output_fusion": "false",
}


def _bench():
    spec = importlib.util.spec_from_file_location(
        "tpuwsi_bench", os.path.join("/root/repo", "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def run(name: str, overrides: dict, batch: int, k: int = 32,
        n_calls: int = 3) -> float:
    bench = _bench()
    state, raw_step = bench.build(batch, raw=True, vit_overrides=overrides)

    def multi(state, b, rng):
        def body(carry, i):
            st, m = raw_step(carry, b, jax.random.fold_in(rng, i))
            return st, m["loss"]
        return jax.lax.scan(body, state, jnp.arange(k))

    rng = jax.random.PRNGKey(1)
    imgs = np.random.randint(0, 255, (batch, 256, 256, 3), dtype=np.uint8)
    b = {"images": jnp.asarray(imgs)}
    t0 = time.perf_counter()
    step = jax.jit(multi).lower(state, b, rng).compile(compiler_options=FLAGS)
    print(f"{name:10s} compiled in {time.perf_counter()-t0:.0f}s", flush=True)
    state, losses = step(state, b, rng)
    np.asarray(losses)
    t0 = time.perf_counter()
    for i in range(n_calls):
        state, losses = step(state, b, jax.random.fold_in(rng, 1000 + i))
        np.asarray(losses)
    dt = (time.perf_counter() - t0) / (n_calls * k)
    print(f"{name:10s} {dt*1e3:8.2f} ms/step  {batch*8/dt:9.1f} views/s",
          flush=True)
    return dt


def main(variants: dict):
    args = sys.argv[1:]
    batch = int(args[0]) if args and args[0].isdigit() else 96
    names = [a for a in args if not a.isdigit()] or list(variants)
    results = {n: run(n, variants[n], batch) for n in names}
    best = min((v, k) for k, v in results.items())
    print(f"\nbest: {best[1]} at {best[0]*1e3:.2f} ms/step")
