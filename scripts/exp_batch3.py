#!/usr/bin/env python
"""views/s vs batch under the scanned multi-step driver (bench.py form).

Usage: python scripts/exp_batch3.py [batch ...]   (default: 96 128 160 192)
"""

from __future__ import annotations

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")


def run(batch_size: int, K: int = 8) -> float:
    from bench import build

    state, raw_step = build(batch_size, raw=True)
    rng = jax.random.PRNGKey(1)
    imgs = np.random.randint(0, 255, (batch_size, 256, 256, 3), dtype=np.uint8)
    batch = {"images": jnp.asarray(imgs)}

    def multi(state, batch, rng):
        def body(carry, i):
            st, m = raw_step(carry, batch, jax.random.fold_in(rng, i))
            return st, m["loss"]
        return jax.lax.scan(body, state, jnp.arange(K))

    step = (
        jax.jit(multi)
        .lower(state, batch, rng)
        .compile(compiler_options={
            "xla_tpu_enable_latency_hiding_scheduler": "true"})
    )
    state, losses = step(state, batch, rng)
    np.asarray(losses)
    n_calls = 4
    t0 = time.perf_counter()
    for i in range(n_calls):
        state, losses = step(state, batch, jax.random.fold_in(rng, 99 + i))
        np.asarray(losses)
    dt = (time.perf_counter() - t0) / (n_calls * K)
    return dt


def main():
    batches = [int(a) for a in sys.argv[1:]] or [96, 128, 160, 192]
    for b in batches:
        try:
            dt = run(b)
            print(f"b{b:4d}: {dt*1e3:7.1f} ms/step  {b*8/dt:8.0f} views/s",
                  flush=True)
        except Exception as e:  # HBM OOM etc.
            print(f"b{b:4d}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
