#!/usr/bin/env python
"""Attribute the literal-CLI-step delta (7,852 -> 7,737 views/s).

The round-4 bench measures the production step assembled by
tpuwsi.cli.train.ssl_step_bundle, which adds three pieces the old
config-pinned bench step omitted: global-norm grad clipping (3.0),
drop-path 0.1 RNG threading, and the warmup-cosine LR schedule. This A/B
builds the EXACT bundle step, then rebuilds it with each piece disabled,
to attribute the ~1.5 ms/step and decide whether any slack is real.

Variants:
  prod    : the bundle as shipped (baseline)
  nodp    : drop_path_rate=0 (removes ~48 per-block threefry calls + masks)
  noclip  : clip_grad=None (removes the global-norm reduce + scale pass)
  neither : both off (additivity check)
"""

from __future__ import annotations

import dataclasses
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

K = 32
N_CALLS = 3


def build(batch: int, nodp: bool, noclip: bool):
    import bench as benchmod  # repo-root bench.py (PYTHONPATH has /root/repo)
    from tpuwsi.ssl_dino import create_dino_state, make_dino_train_step
    from tpuwsi.train import make_optimizer

    b = benchmod.build_bundle(
        batch, vit_overrides={"drop_path_rate": 0.0} if nodp else None)
    if noclip:
        ocfg = dataclasses.replace(b.ocfg, clip_grad=None)
        tx, _ = make_optimizer(ocfg, b.params, batch)
        state = create_dino_state(b.params, tx, b.dcfg)
        raw_step = make_dino_train_step(b.model.apply, tx, b.dcfg,
                                        multicrop_fn=b.multicrop)
        return state, raw_step
    return b.state, b.raw_step


def run(name: str, batch: int, nodp: bool, noclip: bool) -> float:
    state, raw_step = build(batch, nodp, noclip)

    def multi(state, b, rng):
        def body(carry, i):
            st, m = raw_step(carry, b, jax.random.fold_in(rng, i))
            return st, m["loss"]
        return jax.lax.scan(body, state, jnp.arange(K))

    rng = jax.random.PRNGKey(1)
    imgs = np.random.randint(0, 255, (batch, 256, 256, 3), dtype=np.uint8)
    b = {"images": jnp.asarray(imgs)}
    t0 = time.perf_counter()
    step = jax.jit(multi).lower(state, b, rng).compile(compiler_options=FLAGS)
    print(f"{name:8s} compiled in {time.perf_counter()-t0:.0f}s", flush=True)
    state, losses = step(state, b, rng)
    np.asarray(losses)
    t0 = time.perf_counter()
    for i in range(N_CALLS):
        state, losses = step(state, b, jax.random.fold_in(rng, 1000 + i))
        np.asarray(losses)
    dt = (time.perf_counter() - t0) / (N_CALLS * K)
    print(f"{name:8s} {dt*1e3:8.2f} ms/step  {batch*8/dt:9.1f} views/s",
          flush=True)
    return dt


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    names = sys.argv[2:] or ["prod", "nodp", "noclip", "neither"]
    table = {
        "prod": (False, False),
        "nodp": (True, False),
        "noclip": (False, True),
        "neither": (True, True),
    }
    res = {n: run(n, batch, *table[n]) for n in names}
    base = res.get("prod")
    for n, dt in res.items():
        extra = f"  delta {1e3*(dt-base):+.2f} ms" if base and n != "prod" else ""
        print(f"{n:8s} {dt*1e3:8.2f} ms/step{extra}")


if __name__ == "__main__":
    main()
