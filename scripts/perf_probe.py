#!/usr/bin/env python
"""Component-level timing probe for the DINO SSL step (real TPU).

Times each stage of the headline bench config in isolation so optimization
effort goes where the milliseconds are. Usage: python scripts/perf_probe.py
"""

from __future__ import annotations

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, iters=20):
    out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: np.asarray(x) if hasattr(x, "shape") else x,
        out,
    )
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    # force a real fetch (axon block_until_ready doesn't surface execution)
    leaves = [l for l in jax.tree_util.tree_leaves(out) if hasattr(l, "ravel")]
    np.asarray(leaves[0].ravel()[0])
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:42s} {dt:8.2f} ms")
    return dt


def main():
    from tpuwsi.models import DINOHead
    from tpuwsi.models.vit import VisionTransformer, vit_small
    from tpuwsi.preprocess.multicrop import MultiCropConfig, make_multicrop
    from tpuwsi.ssl_dino import (
        DINOConfig,
        DINOModel,
        create_dino_state,
        make_dino_train_step,
        dino_loss,
    )
    from tpuwsi.train import OptimConfig, make_optimizer

    B = 64
    on_tpu = jax.default_backend() == "tpu"
    backbone = VisionTransformer(
        vit_small(num_classes=0, img_size=224, use_pallas_attention=on_tpu,
                  gelu_approx=True)
    )
    head = DINOHead(out_dim=65536, hidden_dim=2048, bottleneck_dim=256,
                    gelu_approx=True)
    model = DINOModel(backbone=backbone, head=head)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 224, 224, 3), jnp.float32))
    dcfg = DINOConfig(out_dim=65536, n_local=6, total_steps=1000)
    ocfg = OptimConfig(opt="adamw", lr=5e-4, weight_decay=0.04)
    tx, _ = make_optimizer(ocfg, params, global_batch_size=B)
    state = create_dino_state(params, tx, dcfg)
    mc = make_multicrop(MultiCropConfig(global_size=224, local_size=96, n_local=6))

    imgs = jnp.asarray(
        np.random.randint(0, 255, (B, 256, 256, 3), dtype=np.uint8))
    rng = jax.random.PRNGKey(1)

    g = jnp.zeros((2 * B, 224, 224, 3), jnp.float32)
    l = jnp.zeros((6 * B, 96, 96, 3), jnp.float32)

    # --- components ---
    mc_j = jax.jit(lambda k, x: mc(k, x))
    timeit("multicrop (64 tiles -> 8 views)", mc_j, rng, imgs)

    bb_params = {"params": params["params"]["backbone"]}
    hd_params = {"params": params["params"]["head"]}

    bb_fwd = jax.jit(lambda p, x: backbone.apply(p, x))
    timeit("backbone fwd globals (128@224)", bb_fwd, bb_params, g)
    timeit("backbone fwd locals (384@96)", bb_fwd, bb_params, l)

    def bb_loss(p, x):
        return backbone.apply(p, x).sum()

    bb_grad = jax.jit(jax.grad(bb_loss))
    timeit("backbone fwd+bwd globals", bb_grad, bb_params, g)
    timeit("backbone fwd+bwd locals", bb_grad, bb_params, l)

    feats_s = jnp.zeros((8 * B, 384), jnp.float32)
    hd_fwd = jax.jit(lambda p, x: head.apply(p, x))
    timeit("head fwd (512 samples)", hd_fwd, hd_params, feats_s)

    def hd_loss(p, x):
        return head.apply(p, x).sum()

    hd_grad = jax.jit(jax.grad(hd_loss))
    timeit("head fwd+bwd (512 samples)", hd_grad, hd_params, feats_s)

    s_out = jnp.zeros((8, B, 65536), jnp.float32)
    t_out = jnp.zeros((2, B, 65536), jnp.float32)
    center = jnp.zeros((1, 65536), jnp.float32)
    loss_j = jax.jit(
        lambda s, t, c: dino_loss(s, t, c, 0.1, 0.04, 2)[0]
    )
    timeit("dino loss (8x64x65536)", loss_j, s_out, t_out, center)

    def loss_grad_fn(s, t, c):
        return dino_loss(s, t, c, 0.1, 0.04, 2)[0]

    timeit("dino loss grad", jax.jit(jax.grad(loss_grad_fn)), s_out, t_out,
           center)

    grads = jax.tree_util.tree_map(jnp.zeros_like, params)
    opt_j = jax.jit(lambda g_, s_, p_: tx.update(g_, s_, p_))
    timeit("optimizer update", opt_j, grads, state.opt_state, params)

    from tpuwsi.train.ema import ema_update
    ema_j = jax.jit(lambda p, t: ema_update(p, t, 0.996))
    timeit("teacher EMA update", ema_j, params, params)

    step = jax.jit(make_dino_train_step(model.apply, tx, dcfg, multicrop_fn=mc))
    batch = {"images": imgs}

    def run_step(s):
        ns, m = step(s, batch, rng)
        return m["loss"]

    timeit("FULL STEP", run_step, state, iters=20)


if __name__ == "__main__":
    main()
