#!/usr/bin/env python
"""Post-bf16-aug flag/driver A/B at b96: LHS on/off, aggressive
opt-barrier removal, and scan length K (per-dispatch amortization).

Usage: python scripts/exp_flags3.py
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

LHS = {"xla_tpu_enable_latency_hiding_scheduler": "true"}

VARIANTS = {
    "lhs_k8": (LHS, 8),
    "nolhs_k8": ({}, 8),
    "optbar_k8": ({**LHS, "xla_tpu_aggressive_opt_barrier_removal": "true"}, 8),
    "lhs_k32": (LHS, 32),
    "optbar_k32": (
        {**LHS, "xla_tpu_aggressive_opt_barrier_removal": "true"}, 32),
}


def run(batch_size: int, flags: dict, K: int) -> float:
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

    lowered = jax.jit(multi).lower(state, batch, rng)
    step = lowered.compile(compiler_options=flags) if flags else lowered.compile()
    state, losses = step(state, batch, rng)
    np.asarray(losses)
    n_calls = max(1, 32 // K)
    t0 = time.perf_counter()
    for i in range(n_calls):
        state, losses = step(state, batch, jax.random.fold_in(rng, 99 + i))
        np.asarray(losses)
    return (time.perf_counter() - t0) / (n_calls * K)


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    best = None
    for name, (flags, K) in VARIANTS.items():
        try:
            dt = run(b, flags, K)
            print(f"{name:14s} {dt*1e3:7.2f} ms/step {b*8/dt:8.0f} views/s",
                  flush=True)
            if best is None or dt < best[1]:
                best = (name, dt)
        except Exception as e:
            print(f"{name:14s} FAILED {type(e).__name__}: {str(e)[:150]}",
                  flush=True)
    if best:
        print(f"\nbest: {best[0]} at {best[1]*1e3:.2f} ms/step")


if __name__ == "__main__":
    main()
