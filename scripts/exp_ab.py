#!/usr/bin/env python
"""A/B full-step experiments for the DINO SSL bench config.

Component micro-timings are unreliable on this remote-dispatch backend, so
each candidate optimization is measured as a full-step delta.

Usage: python scripts/exp_ab.py [variant ...] — variants:
  base | head_bf16 | loss_bf16 | head_loss_bf16 | donate | remat
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


def build(variant: str, batch_size: int = 64):
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

    on_tpu = jax.default_backend() == "tpu"
    head_dtype = (
        jnp.bfloat16 if variant in ("head_bf16", "head_loss_bf16", "all_bf16")
        else jnp.float32
    )
    loss_bf16 = variant in ("loss_bf16", "head_loss_bf16", "all_bf16")
    ln_dtype = (
        jnp.bfloat16 if variant in ("ln_bf16", "all_bf16") else jnp.float32
    )
    use_pallas = on_tpu and variant != "xla_attn"
    if variant.startswith("oflash"):
        # official tuned TPU flash-attention kernel, padded to 128-multiples
        # with segment-id key masking (padded q rows sliced off)
        import tpuwsi.models.vit as vitmod
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            SegmentIds,
            flash_attention,
        )

        def oflash(qkv, num_heads, scale=None, interpret=None,
                   training=False):
            b, n, d3 = qkv.shape
            d = d3 // 3
            hd = d // num_heads
            if n < 64:  # local crops: XLA wins below ~64 tokens
                from tpuwsi.ops.attention import _mha_reference

                return _mha_reference(qkv, num_heads, hd ** -0.5)
            x = qkv.reshape(b, n, 3, num_heads, hd)
            q = x[:, :, 0].transpose(0, 2, 1, 3)
            k = x[:, :, 1].transpose(0, 2, 1, 3)
            v = x[:, :, 2].transpose(0, 2, 1, 3)
            npad = -(-n // 128) * 128
            pad = npad - n
            if pad:
                q, k, v = (
                    jnp.pad(t, ((0, 0), (0, 0), (0, pad), (0, 0)))
                    for t in (q, k, v)
                )
            seg = jnp.concatenate(
                [jnp.ones((b, n), jnp.int32), jnp.zeros((b, pad), jnp.int32)],
                axis=1,
            )
            o = flash_attention(
                q, k, v, segment_ids=SegmentIds(seg, seg),
                sm_scale=hd ** -0.5 if scale is None else scale,
            )
            return o[:, :, :n, :].transpose(0, 2, 1, 3).reshape(b, n, d)

        vitmod.mha_from_qkv = oflash
    backbone = VisionTransformer(
        vit_small(num_classes=0, img_size=224, use_pallas_attention=use_pallas,
                  gelu_approx=True, ln_dtype=ln_dtype,
                  remat_blocks=(variant in ("remat", "scan_remat")),
                  scan_blocks=(variant in ("scan", "scan_remat")))
    )
    model = DINOModel(
        backbone=backbone,
        head=DINOHead(out_dim=65536, hidden_dim=2048, bottleneck_dim=256,
                      gelu_approx=True, dtype=head_dtype),
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3), jnp.float32)
    )
    dcfg = DINOConfig(out_dim=65536, n_local=6, total_steps=1000,
                      loss_pair_bf16=loss_bf16)
    ocfg = OptimConfig(opt="adamw", lr=5e-4, weight_decay=0.04)
    tx, _ = make_optimizer(ocfg, params, global_batch_size=batch_size)
    state = create_dino_state(params, tx, dcfg)
    mc = make_multicrop(MultiCropConfig(global_size=224, local_size=96, n_local=6))
    step_fn = make_dino_train_step(model.apply, tx, dcfg, multicrop_fn=mc)
    if variant == "donate":
        step = jax.jit(step_fn, donate_argnums=(0,))
    else:
        step = jax.jit(step_fn)
    return state, step


def run(variant: str, batch_size: int = 64, n_iters: int = 40):
    if variant == "rbg":
        # threefry key derivation + bit generation is serialized scalar work
        # on TPU; rbg uses the hardware RNG path. The augmentation pipeline
        # draws ~77M samples/step — A/B the generator as a full-step delta.
        jax.config.update("jax_default_prng_impl", "rbg")
        variant = "base"
    state, step = build(variant, batch_size)
    rng = jax.random.PRNGKey(1)
    imgs = np.random.randint(0, 255, (batch_size, 256, 256, 3), dtype=np.uint8)
    batch = {"images": jnp.asarray(imgs)}
    state, m = step(state, batch, rng)
    loss0 = float(m["loss"])
    t0 = time.perf_counter()
    for i in range(n_iters):
        state, m = step(state, batch, rng)
        if i % 4 == 3:
            float(m["loss"])
    float(m["loss"])
    dt = time.perf_counter() - t0
    tiles = batch_size * n_iters / dt
    print(
        f"{variant:16s} b{batch_size:<4d} {dt / n_iters * 1e3:7.2f} ms/step  "
        f"{tiles:7.1f} tiles/s  {tiles * 8:8.1f} views/s  loss0={loss0:.4f}"
    )


if __name__ == "__main__":
    # each arg: "variant" or "variant:batch"
    variants = sys.argv[1:] or ["base"]
    for v in variants:
        name, _, b = v.partition(":")
        run(name, int(b) if b else 64)
