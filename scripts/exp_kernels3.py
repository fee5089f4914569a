#!/usr/bin/env python
"""Round-3 kernel-family A/B on the full DINO step.

The fresh b96 trace (exp_trace3) shows XLA's GEMM fusions now run at
~774 GB/s (near HBM peak) while OUR Pallas custom-calls are 61 ms of the
109 ms device step. This re-measures each kernel family against today's XLA
baseline — the round-2 decisions (wide-softmax attn, fused MLP block) were
taken against a different surrounding step.

Usage: python scripts/exp_kernels3.py [batch] [variant ...]
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
    "xla_mlp": {"use_fused_mlp": False},
    "xla_attn": {"use_pallas_attention": False, "use_fused_mlp": True},
    "xla_all": {"use_pallas_attention": False, "use_fused_mlp": False},
    "ln_bf16": {"ln_dtype": jnp.bfloat16},
    "ln_bf16_xla_mlp": {"ln_dtype": jnp.bfloat16, "use_fused_mlp": False},
}


def build(batch_size: int, overrides: dict):
    import dataclasses

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

    cfg = vit_small(num_classes=0, img_size=224, use_pallas_attention=True,
                    gelu_approx=True)
    cfg = dataclasses.replace(cfg, **overrides)
    model = DINOModel(
        backbone=VisionTransformer(cfg),
        head=DINOHead(out_dim=65536, hidden_dim=2048, bottleneck_dim=256,
                      gelu_approx=True, dtype=jnp.bfloat16),
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3), jnp.float32)
    )
    dcfg = DINOConfig(out_dim=65536, n_local=6, total_steps=1000,
                      loss_pair_bf16=True)
    ocfg = OptimConfig(opt="adamw", lr=5e-4, weight_decay=0.04)
    tx, _ = make_optimizer(ocfg, params, global_batch_size=batch_size)
    state = create_dino_state(params, tx, dcfg)
    mc = make_multicrop(MultiCropConfig(global_size=224, local_size=96,
                                        n_local=6))
    step = jax.jit(make_dino_train_step(model.apply, tx, dcfg,
                                        multicrop_fn=mc))
    return state, step


def run(name, overrides, batch, iters=30):
    state, step = build(batch, overrides)
    rng = jax.random.PRNGKey(1)
    imgs = np.random.randint(0, 255, (batch, 256, 256, 3), dtype=np.uint8)
    b = {"images": jnp.asarray(imgs)}
    step = step.lower(state, b, rng).compile(
        compiler_options={"xla_tpu_enable_latency_hiding_scheduler": "true"}
    )
    s, m = step(state, b, rng)
    float(m["loss"])
    t0 = time.perf_counter()
    s2 = state
    for i in range(iters):
        s2, m = step(s2, b, rng)
        if i % 4 == 3:
            float(m["loss"])
    float(m["loss"])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:18s} {dt*1e3:8.2f} ms/step  {batch*8/dt:9.1f} views/s")
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
