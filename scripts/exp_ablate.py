#!/usr/bin/env python
"""Ablation timing of the DINO SSL step: measure the FULL jitted step with
individual pieces removed. Full-step deltas are the only reliable timing on
this remote-dispatch backend.

Usage: python scripts/exp_ablate.py [name ...]
names: full, no_opt, no_ema, no_teacher, no_locals, no_globals, no_multicrop,
       fwd_only, no_head
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
import optax


def build(name: str, batch_size: int = 64):
    from tpuwsi.models import DINOHead
    from tpuwsi.models.vit import VisionTransformer, vit_small
    from tpuwsi.preprocess.multicrop import MultiCropConfig, make_multicrop
    from tpuwsi.ssl_dino import DINOConfig, DINOModel, create_dino_state
    from tpuwsi.ssl_dino.dino import dino_loss, teacher_temp_schedule
    from tpuwsi.train import OptimConfig, make_optimizer
    from tpuwsi.train.ema import cosine_momentum_schedule, ema_update

    on_tpu = jax.default_backend() == "tpu"
    if name == "no_attn":
        # identity "attention": isolates the softmax-attention cost from the
        # GEMM/LN/residual skeleton (qkv/proj GEMMs stay)
        import tpuwsi.models.vit as vitmod

        vitmod.mha_from_qkv = (
            lambda qkv, h, **kw: qkv[..., : qkv.shape[-1] // 3]
        )
    backbone = VisionTransformer(
        vit_small(num_classes=0, img_size=224, use_pallas_attention=on_tpu,
                  gelu_approx=True)
    )
    model = DINOModel(
        backbone=backbone,
        head=DINOHead(out_dim=65536, hidden_dim=2048, bottleneck_dim=256,
                      gelu_approx=True),
    )
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 224, 224, 3), jnp.float32))
    cfg = DINOConfig(out_dim=65536, n_local=6, total_steps=1000)
    ocfg = OptimConfig(opt="adamw", lr=5e-4, weight_decay=0.04)
    tx, _ = make_optimizer(ocfg, params, global_batch_size=batch_size)
    state = create_dino_state(params, tx, cfg)
    mc = make_multicrop(MultiCropConfig(global_size=224, local_size=96,
                                        n_local=6))
    ema_sched = cosine_momentum_schedule(cfg.ema_base, cfg.ema_final,
                                         cfg.total_steps)
    temp_sched = teacher_temp_schedule(cfg)
    apply = model.apply

    def step(state, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        crop_key, drop_key = jax.random.split(rng)
        if name == "no_multicrop":
            b = batch["images"].shape[0]
            g_views = jnp.zeros((2, b, 224, 224, 3), jnp.bfloat16)
            l_views = jnp.zeros((6, b, 96, 96, 3), jnp.bfloat16)
        else:
            g_views, l_views = mc(crop_key, batch["images"])
            g_views = jnp.swapaxes(g_views, 0, 1)
            l_views = jnp.swapaxes(l_views, 0, 1)
        t_temp = temp_sched(state.step)
        momentum = ema_sched(state.step)
        g_drop, g_path, l_drop, l_path = jax.random.split(drop_key, 4)

        def compute_loss(params):
            vg, b = g_views.shape[0], g_views.shape[1]
            outs = []
            if name != "no_globals":
                s_g = apply(
                    params, g_views.reshape((-1,) + g_views.shape[2:]),
                    deterministic=False,
                    rngs={"dropout": g_drop, "droppath": g_path},
                ).reshape(vg, b, -1)
                outs.append(s_g)
            if name != "no_locals":
                vl = l_views.shape[0]
                s_l = apply(
                    params, l_views.reshape((-1,) + l_views.shape[2:]),
                    deterministic=False,
                    rngs={"dropout": l_drop, "droppath": l_path},
                ).reshape(vl, b, -1)
                outs.append(s_l)
            s_out = jnp.concatenate(outs, axis=0)
            if name == "no_teacher":
                t_out = jax.lax.stop_gradient(s_out[:2])
            else:
                t_out = apply(
                    state.teacher_params,
                    g_views.reshape((-1,) + g_views.shape[2:]),
                    deterministic=True,
                ).reshape(vg, b, -1)
                t_out = jax.lax.stop_gradient(t_out)
            loss, batch_center = dino_loss(
                s_out.astype(jnp.float32), t_out.astype(jnp.float32),
                state.center, cfg.student_temp, t_temp, cfg.n_global,
            )
            return loss, batch_center

        if name == "fwd_only":
            loss, batch_center = compute_loss(state.student_params)
            grads = jax.tree_util.tree_map(jnp.zeros_like, state.student_params)
        else:
            (loss, batch_center), grads = jax.value_and_grad(
                compute_loss, has_aux=True
            )(state.student_params)

        if name == "no_opt":
            new_student, new_opt_state = state.student_params, state.opt_state
        elif name == "sgd_update":
            # keeps the backward live but skips AdamW/opt-state churn
            new_student = jax.tree_util.tree_map(
                lambda p, g: p - 1e-4 * g.astype(p.dtype),
                state.student_params, grads,
            )
            new_opt_state = state.opt_state
        else:
            updates, new_opt_state = tx.update(
                grads, state.opt_state, state.student_params
            )
            new_student = optax.apply_updates(state.student_params, updates)
        if name == "no_ema":
            new_teacher = state.teacher_params
        else:
            new_teacher = ema_update(state.teacher_params, new_student,
                                     momentum)
        new_center = (state.center * cfg.center_momentum
                      + batch_center * (1.0 - cfg.center_momentum))
        new_state = state.replace(
            step=state.step + 1, student_params=new_student,
            teacher_params=new_teacher, opt_state=new_opt_state,
            center=new_center,
        )
        return new_state, {"loss": loss}

    return state, jax.jit(step)


def run(name: str, batch_size: int = 64, n_iters: int = 40):
    state, step = build(name, batch_size)
    rng = jax.random.PRNGKey(1)
    imgs = np.random.randint(0, 255, (batch_size, 256, 256, 3), dtype=np.uint8)
    batch = {"images": jnp.asarray(imgs)}
    state, m = step(state, batch, rng)
    float(m["loss"])
    t0 = time.perf_counter()
    for i in range(n_iters):
        state, m = step(state, batch, rng)
        if i % 4 == 3:
            float(m["loss"])
    float(m["loss"])
    dt = time.perf_counter() - t0
    print(f"{name:14s} {dt / n_iters * 1e3:7.2f} ms/step")


if __name__ == "__main__":
    names = sys.argv[1:] or ["full", "no_opt", "no_ema", "no_teacher",
                             "no_locals", "no_globals", "no_multicrop",
                             "fwd_only"]
    for n in names:
        name, _, b = n.partition(":")
        run(name, int(b) if b else 64)
