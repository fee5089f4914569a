#!/usr/bin/env python
"""Round-3 scheduler/flag battery for the DINO SSL bench step.

BENCH.md round-2 diagnosis: ops run 30-40% over their isolated floors
in-step (qkv wgrad 0.17 ms isolated vs 0.51 ms in-step) — systemic
scheduling/DMA-prologue overhead, not per-op cost. This script A/Bs XLA:TPU
compiler options (each on top of the latency-hiding baseline) as full-step
deltas, reporting ms/step and views/s. Unknown/rejected flags are caught and
reported, not fatal.

Usage: python scripts/exp_sched3.py [batch] [variant ...]
"""

from __future__ import annotations

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, "/root/repo")

LHS = {"xla_tpu_enable_latency_hiding_scheduler": "true"}

VARIANTS = {
    "base": dict(LHS),
    "nolhs": {},
    "rerun4": {**LHS, "xla_latency_hiding_scheduler_rerun": "4"},
    "depth_over_stall": {
        **LHS, "xla_lhs_prioritize_async_depth_over_stall": "true"
    },
    "opt_barrier": {**LHS, "xla_tpu_aggressive_opt_barrier_removal": "true"},
    "fusion_cost": {
        **LHS, "xla_tpu_enable_experimental_fusion_cost_model": "true"
    },
    "dot_dot": {**LHS, "xla_tpu_dot_dot_fusion_duplicated": "true"},
    "bcast_prio": {
        **LHS, "xla_tpu_enable_aggressive_broadcast_priority_update": "true"
    },
    "multi_loop_fusion": {
        **LHS, "xla_tpu_enable_multi_level_nested_loop_fusion": "true"
    },
    "bw_scale_0.5": {
        **LHS, "xla_tpu_async_copy_bandwidth_scaling_factor": "0.5"
    },
    "bw_scale_2": {
        **LHS, "xla_tpu_async_copy_bandwidth_scaling_factor": "2.0"
    },
    "slop_80": {**LHS, "xla_tpu_memory_limit_slop_factor": "80"},
    "slop_99": {**LHS, "xla_tpu_memory_limit_slop_factor": "99"},
    "vmem_24m": {**LHS, "xla_tpu_scoped_vmem_limit_kib": "24576"},
    "licm_2": {**LHS, "xla_tpu_licm_size_inflation_ratio": "2.0"},
    "retry_oom": {**LHS, "xla_tpu_sliced_prefetch": "true"},
}


def build(batch_size: int):
    sys.path.insert(0, "/root/repo")
    from bench import build as bench_build

    return bench_build(batch_size)


def run_variant(name, opts, state, step_jit, batch, rng, iters=30):
    try:
        fn = step_jit.lower(state, batch, rng).compile(
            compiler_options={k: v for k, v in opts.items()}
        )
    except Exception as e:
        print(f"{name:22s} REJECTED: {str(e)[:140]}")
        return None
    s, m = fn(state, batch, rng)
    float(m["loss"])
    t0 = time.perf_counter()
    s2 = state
    for i in range(iters):
        s2, m = fn(s2, batch, rng)
        if i % 4 == 3:
            float(m["loss"])
    float(m["loss"])
    dt = (time.perf_counter() - t0) / iters
    views = batch["images"].shape[0] * 8 / dt
    print(f"{name:22s} {dt * 1e3:8.2f} ms/step  {views:9.1f} views/s")
    return dt


def main():
    args = [a for a in sys.argv[1:]]
    batch = int(args[0]) if args and args[0].isdigit() else 96
    names = [a for a in args if not a.isdigit()] or list(VARIANTS)

    state, step = build(batch)
    rng = jax.random.PRNGKey(1)
    imgs = np.random.randint(0, 255, (batch, 256, 256, 3), dtype=np.uint8)
    b = {"images": jnp.asarray(imgs)}

    results = {}
    for name in names:
        results[name] = run_variant(name, VARIANTS[name], state, step, b, rng)
    best = min((v, k) for k, v in results.items() if v is not None)
    print(f"\nbest: {best[1]} at {best[0]*1e3:.2f} ms/step")


if __name__ == "__main__":
    main()
