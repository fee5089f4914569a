#!/usr/bin/env python
"""Emitter-targeted flag sweep: the per-fusion MFU table (exp_mfu3.py) shows
the GEMM region at 84% MFU with the slack concentrated in backward
dgrad+wgrad+bias-grad fusions (61-77%). These flags steer what XLA fuses
into/out of convolutions (the conv emitter IS the GEMM path on TPU).

Usage: python scripts/exp_flags3b.py [batch]
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
    "base": LHS,
    "no_conv_input_fusion": {**LHS, "xla_jf_conv_input_fusion": "false"},
    "no_conv_output_fusion": {**LHS, "xla_jf_conv_output_fusion": "false"},
    "no_rwb": {**LHS, "xla_tpu_rwb_fusion": "false"},
    "conv_vmem_more": {**LHS, "xla_jf_scoped_vmem_kib_conv": "24576"},
    "bounds_check_off": {**LHS, "xla_tpu_debug_bounds_checks": "false"},
}


def run(batch_size: int, flags: dict, K: int = 8) -> float:
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

    step = jax.jit(multi).lower(state, batch, rng).compile(
        compiler_options=flags)
    state, losses = step(state, batch, rng)
    np.asarray(losses)
    n_calls = 4
    t0 = time.perf_counter()
    for i in range(n_calls):
        state, losses = step(state, batch, jax.random.fold_in(rng, 99 + i))
        np.asarray(losses)
    return (time.perf_counter() - t0) / (n_calls * K)


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    best = None
    for name, flags in VARIANTS.items():
        try:
            dt = run(b, flags)
            print(f"{name:22s} {dt*1e3:7.2f} ms/step {b*8/dt:8.0f} views/s",
                  flush=True)
            if best is None or dt < best[1]:
                best = (name, dt)
        except Exception as e:
            print(f"{name:22s} REJECTED: {str(e)[:120]}", flush=True)
    if best:
        print(f"\nbest: {best[0]} at {best[1]*1e3:.2f} ms/step")


if __name__ == "__main__":
    main()
