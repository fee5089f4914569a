#!/usr/bin/env python
"""A/B: supervised-step augmentation compute dtype (f32 vs bf16).

The round-5 supervised closing accounting (exp_serve5) shows ~4.5 ms of
low-bandwidth (285 GB/s) fusion work consistent with the f32 'cbnfrsc'
recipe stage. The DINO multicrop already adopted bf16 aug compute
(tuned_multicrop_kwargs) for the same reason. This measures the same move
on the supervised step: the recipe ops are dtype-preserving for float
inputs (augment._to_float only converts uint8), so feeding bf16 [0,1]
images runs the aug stage in bf16.

K-scan methodology (dispatch-amortized, carry-varied inputs).
"""

from __future__ import annotations

import sys
import time

import jax

sys.path.insert(0, "/root/repo")

from tpuwsi.core.compile import machine_cache_dir  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir", machine_cache_dir("/root/repo/.jax_cache")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, "/root/repo")

FLAGS = {
    "xla_tpu_enable_latency_hiding_scheduler": "true",
    "xla_tpu_rwb_fusion": "false",
    "xla_jf_conv_output_fusion": "false",
}
K = 16
N_CALLS = 3


def run(tag: str, aug_dtype, batch: int = 64) -> float:
    # the EXACT run-book supervised step, via the shared builder
    # (exp_serve5.supervised_step_parts) — no hand-copied config
    sys.path.insert(0, "/root/repo/scripts")
    from exp_serve5 import supervised_step_parts

    if aug_dtype is None:
        override = None  # uint8 in -> f32 aug (status quo)
    else:
        def override(recipe):
            return lambda key, imgs: recipe(
                key, imgs.astype(aug_dtype) / 255.0)
    state, step, b, rng = supervised_step_parts(batch, aug_override=override)

    def multi(state, b, rng):
        def body(carry, i):
            st, m = step(carry, jax.tree_util.tree_map(lambda x: x, b),
                         jax.random.fold_in(rng, i))
            return st, m["loss"]
        return jax.lax.scan(body, state, jnp.arange(K))
    jit = jax.jit(multi).lower(state, b, rng).compile(compiler_options=FLAGS)
    state, losses = jit(state, b, rng)
    np.asarray(losses)
    t0 = time.perf_counter()
    for i in range(N_CALLS):
        state, losses = jit(state, b, jax.random.fold_in(rng, 99 + i))
        np.asarray(losses)
    dt = (time.perf_counter() - t0) / (N_CALLS * K)
    rate = batch / dt
    print(f"{tag:>14s}: {dt*1e3:7.2f} ms/step  {rate:8.1f} tiles/s  "
          f"loss[-1]={float(np.asarray(losses)[-1]):.4f}", flush=True)
    return rate


def main():
    r_f32 = run("aug f32", None)
    r_bf16 = run("aug bf16", jnp.bfloat16)
    print(f"bf16/f32: {r_bf16 / r_f32:.4f}")


if __name__ == "__main__":
    main()
