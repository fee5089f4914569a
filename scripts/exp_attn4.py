#!/usr/bin/env python
"""Attention saved-probs A/B on the full DINO step (round-4, region 3:
Pallas attention 22.7 ms vs ~19 ms head_dim cap).

The wide-softmax backward recomputes QK^T scores and the masked softmax
from qkv (flash-style). "savep" makes the forward kernel also emit the
bf16 probabilities so the backward drops that recompute: 4 dots per head
instead of 5 and no backward softmax pass, for ~190 MB/step of p traffic
(~0.4 ms at HBM peak).

Measured on the EXACT bench.py config (K=32 scanned driver, adopted
flags, bf16 aug) so deltas translate 1:1 to the headline number.

Usage: python scripts/exp_attn4.py [batch] [variant ...]
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
    # forward kernel saves softmax probs (bf16); backward skips the QK^T
    # recompute + the whole masked-softmax VPU pass (1 of 5 dots, half the
    # backward elementwise) for ~0.4 ms/step of HBM p traffic.
    "savep": {"attn_save_probs": True},
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
