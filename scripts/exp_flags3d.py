#!/usr/bin/env python
"""Multi-output-fusion flag sweep (flag names mined from libtpu strings):
the final-config MFU table still shows the backward dgrad+wgrad+dbias
multi-output fusions at 56-79% while single-GEMM fusions hit 85-95%.

Usage: python scripts/exp_flags3d.py [batch]
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

from tpuwsi.core.compile import _SCHED_OPTS  # noqa: E402

VARIANTS = {
    "base": dict(_SCHED_OPTS),
    "mof_off": {**_SCHED_OPTS, "xla_jf_enable_multi_output_fusion": "false"},
    "adv_mof_off": {**_SCHED_OPTS,
                    "xla_jf_enable_advanced_multi_output_fusion": "false"},
    "pc_mof_off": {
        **_SCHED_OPTS,
        "xla_jf_enable_producer_consumer_multi_output_fusion": "false"},
    "dotdot_off": {**_SCHED_OPTS, "xla_tpu_dot_dot_fusion": "false"},
    "autotune": {**_SCHED_OPTS, "xla_tpu_autotune_fusions": "true"},
}


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    K = 8
    from bench import build

    state, raw_step = build(b, raw=True)
    rng = jax.random.PRNGKey(1)
    imgs = np.random.randint(0, 255, (b, 256, 256, 3), dtype=np.uint8)
    batch = {"images": jnp.asarray(imgs)}

    def multi(state, batch, rng):
        def body(carry, i):
            st, m = raw_step(carry, batch, jax.random.fold_in(rng, i))
            return st, m["loss"]
        return jax.lax.scan(body, state, jnp.arange(K))

    lowered = jax.jit(multi).lower(state, batch, rng)
    best = None
    for name, flags in VARIANTS.items():
        try:
            step = lowered.compile(compiler_options=flags)
            st, losses = step(state, batch, rng)
            np.asarray(losses)
            n_calls = 4
            t0 = time.perf_counter()
            for i in range(n_calls):
                st, losses = step(st, batch, jax.random.fold_in(rng, 99 + i))
                np.asarray(losses)
            dt = (time.perf_counter() - t0) / (n_calls * K)
            print(f"{name:14s} {dt*1e3:7.2f} ms/step {b*8/dt:8.0f} views/s",
                  flush=True)
            if best is None or dt < best[1]:
                best = (name, dt)
        except Exception as e:
            print(f"{name:14s} REJECTED {str(e)[:110]}", flush=True)
    if best:
        print(f"\nbest: {best[0]} at {best[1]*1e3:.2f} ms/step")


if __name__ == "__main__":
    main()
