#!/usr/bin/env python
"""Remat-policy A/B on the full DINO step (round-4, region 1 of the
round-3 closing accounting).

The named GEMM slack: XLA's backward dgrad+wgrad+dbias multi-output
fusions run at 56-79% MFU (9.7 ms over the shape-FLOP floor at b96).
Flag-level splitting and Pallas VJP overrides both measured negative
(BENCH.md round 3). This experiment tries the remaining shape: a
jax.checkpoint policy on each unrolled block, which changes WHICH forward
ops get recomputed adjacent to the backward GEMMs — i.e. restructures the
fusion groups the emitter forms, at the cost of recompute FLOPs.

  base:    no remat (round-3 adopted config)
  dots:    dots_saveable — keep every GEMM output, recompute elementwise
           (cheapest recompute; backward fusions gain fused LN/GELU
           prologues instead of saved-activation loads)
  nobatch: dots_with_no_batch_dims_saveable (the scan-path policy)
  full:    recompute everything (the +1/3-FLOPs upper bound)

Measured on the EXACT bench.py config (K=32 scanned driver, adopted
flags, bf16 aug) so deltas translate 1:1 to the headline number.

Usage: python scripts/exp_remat4.py [batch] [variant ...]
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

VARIANTS = {
    "base": {},
    "dots": {"remat_blocks": True, "remat_policy": "dots_saveable"},
    "nobatch": {
        "remat_blocks": True,
        "remat_policy": "dots_with_no_batch_dims_saveable",
    },
    "full": {"remat_blocks": True, "remat_policy": None},
    # dots_saveable + the named Pallas attention output: the only recompute
    # left is pure elementwise (LN/GELU/bias/residual) — the cheapest
    # possible restructuring of the backward fusion groups.
    "named": {"remat_blocks": True,
              "remat_policy": "dots_saveable+attn_out"},
}

K = 32
FLAGS = {
    "xla_tpu_enable_latency_hiding_scheduler": "true",
    "xla_tpu_rwb_fusion": "false",
    "xla_jf_conv_output_fusion": "false",
}


def build(batch_size: int, overrides: dict):
    import dataclasses

    from tpuwsi.core.tuned import (
        tuned_dino_kwargs,
        tuned_head_kwargs,
        tuned_multicrop_kwargs,
        tuned_vit_kwargs,
    )
    from tpuwsi.models import DINOHead
    from tpuwsi.models.vit import VisionTransformer, vit_small
    from tpuwsi.preprocess.multicrop import MultiCropConfig, make_multicrop
    from tpuwsi.ssl_dino import (
        DINOConfig,
        DINOModel,
        create_dino_state,
        make_dino_train_step,
    )
    from tpuwsi.train import OptimConfig, make_optimizer

    cfg = vit_small(num_classes=0, img_size=224, gelu_approx=True,
                    **tuned_vit_kwargs(True))
    cfg = dataclasses.replace(cfg, **overrides)
    model = DINOModel(
        backbone=VisionTransformer(cfg),
        head=DINOHead(out_dim=65536, hidden_dim=2048, bottleneck_dim=256,
                      gelu_approx=True, **tuned_head_kwargs(True)),
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3), jnp.float32)
    )
    dcfg = DINOConfig(out_dim=65536, n_local=6, total_steps=1000,
                      **tuned_dino_kwargs(True))
    ocfg = OptimConfig(opt="adamw", lr=5e-4, weight_decay=0.04)
    tx, _ = make_optimizer(ocfg, params, global_batch_size=batch_size)
    state = create_dino_state(params, tx, dcfg)
    mc = make_multicrop(MultiCropConfig(global_size=224, local_size=96,
                                        n_local=6,
                                        **tuned_multicrop_kwargs(True)))
    raw_step = make_dino_train_step(model.apply, tx, dcfg, multicrop_fn=mc)

    def multi(state, batch, rng):
        def body(carry, i):
            st, m = raw_step(carry, batch, jax.random.fold_in(rng, i))
            return st, m["loss"]
        return jax.lax.scan(body, state, jnp.arange(K))

    return state, jax.jit(multi)


def run(name, overrides, batch, n_calls=3):
    state, step = build(batch, overrides)
    rng = jax.random.PRNGKey(1)
    imgs = np.random.randint(0, 255, (batch, 256, 256, 3), dtype=np.uint8)
    b = {"images": jnp.asarray(imgs)}
    t0 = time.perf_counter()
    step = step.lower(state, b, rng).compile(compiler_options=FLAGS)
    print(f"{name:10s} compiled in {time.perf_counter()-t0:.0f}s", flush=True)
    state, losses = step(state, b, rng)
    np.asarray(losses)
    t0 = time.perf_counter()
    for i in range(n_calls):
        state, losses = step(state, b, jax.random.fold_in(rng, 1000 + i))
        np.asarray(losses)
    dt = (time.perf_counter() - t0) / (n_calls * K)
    print(f"{name:10s} {dt*1e3:8.2f} ms/step  {batch*8/dt:9.1f} views/s",
          flush=True)
    return dt


def main():
    args = sys.argv[1:]
    batch = int(args[0]) if args and args[0].isdigit() else 96
    names = [a for a in args if not a.isdigit()] or list(VARIANTS)
    results = {}
    for n in names:
        results[n] = run(n, VARIANTS[n], batch)
    best = min((v, k) for k, v in results.items())
    print(f"\nbest: {best[1]} at {best[0]*1e3:.2f} ms/step")


if __name__ == "__main__":
    main()
