"""DINO student/teacher self-supervised training.

The reference ships DINO only as orphaned bytecode (SURVEY §0, §2.9) and its
"SSL" recipe is finetuning timm's DINO-pretrained ViT-S
(train_instruct.txt:17,20). This module makes the latent capability real:
a full student/teacher multi-crop loop per the public DINO recipe, TPU-first:

- teacher is an EMA pytree updated on device, replicated over the mesh
  (zero collectives on the update — SURVEY §2 parallelism table);
- the centering update is a batch mean reduced with ``jax.lax.pmean``-
  equivalent GSPMD semantics: the mean over the *global* batch is exact
  because the batch axis is sharded and ``jnp.mean`` over it becomes an
  all-reduce (SURVEY §7 hard-part 5);
- teacher-temperature warmup and cosine EMA-momentum schedules are traced
  scalars derived from the step counter — no host control flow.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp
import optax

from tpuwsi.models.dino_head import DINOHead
from tpuwsi.models.vit import VisionTransformer
from tpuwsi.train.ema import cosine_momentum_schedule, ema_update


class DINOModel(nn.Module):
    """ViT backbone + DINO projection head (student and teacher geometry)."""

    backbone: VisionTransformer
    head: DINOHead

    def __call__(self, x, deterministic: bool = True):
        feats = self.backbone(x, deterministic=deterministic)
        return self.head(feats, deterministic=deterministic)


@dataclasses.dataclass(frozen=True)
class DINOConfig:
    out_dim: int = 65536
    n_global: int = 2
    n_local: int = 6
    student_temp: float = 0.1
    teacher_temp: float = 0.04
    warmup_teacher_temp: float = 0.04
    warmup_teacher_temp_steps: int = 0
    center_momentum: float = 0.9
    ema_base: float = 0.996
    ema_final: float = 1.0
    total_steps: int = 100_000
    freeze_last_layer_steps: int = 0
    # Run the (B, 65536) cross-view contractions in bf16 (fp32 accumulation).
    loss_pair_bf16: bool = False


@flax.struct.dataclass
class DINOState:
    step: jax.Array
    student_params: object
    teacher_params: object
    opt_state: object
    center: jax.Array  # (1, out_dim)


def create_dino_state(student_params, tx, cfg: DINOConfig) -> DINOState:
    return DINOState(
        step=jnp.zeros((), jnp.int32),
        student_params=student_params,
        teacher_params=jax.tree_util.tree_map(lambda x: x, student_params),
        opt_state=tx.init(student_params),
        center=jnp.zeros((1, cfg.out_dim), jnp.float32),
    )


def teacher_temp_schedule(cfg: DINOConfig):
    def sched(step):
        t = jnp.clip(step / jnp.maximum(cfg.warmup_teacher_temp_steps, 1), 0.0, 1.0)
        return cfg.warmup_teacher_temp + t * (
            cfg.teacher_temp - cfg.warmup_teacher_temp
        )

    return sched


def dino_loss(
    student_out,  # (n_views_student, B, K)
    teacher_out,  # (n_global, B, K)
    center,  # (1, K)
    student_temp: float,
    teacher_temp,
    n_global: int,
    pair_dtype=jnp.float32,
):
    """Cross-entropy between teacher (centered+sharpened) and student views,
    skipping same-view pairs; returns (loss, new_batch_center).

    The softmax/log-softmax reductions run fp32; the (B, K=65536) per-pair
    contraction can run bf16 with fp32 accumulation (``pair_dtype``) —
    halves the HBM traffic of the largest tensors in the step.
    """
    t_logits = (teacher_out - center) / teacher_temp
    t_probs = jax.lax.stop_gradient(jax.nn.softmax(t_logits, axis=-1))
    s_logp = jax.nn.log_softmax(student_out / student_temp, axis=-1)
    t_pair = t_probs.astype(pair_dtype)
    s_pair = s_logp.astype(pair_dtype)

    n_s = s_logp.shape[0]
    total = 0.0
    count = 0
    for ti in range(n_global):
        for si in range(n_s):
            if si == ti:
                continue  # same global view: skip (DINO rule)
            ce = -jnp.einsum(
                "bk,bk->b", t_pair[ti], s_pair[si],
                preferred_element_type=jnp.float32,
            )
            total = total + jnp.mean(ce)
            count += 1
    loss = total / count
    # Batch center over ALL teacher outputs and the global batch: with the
    # batch axis sharded over the mesh, this mean lowers to an all-reduce.
    batch_center = jnp.mean(
        teacher_out.reshape(-1, teacher_out.shape[-1]), axis=0, keepdims=True
    )
    return loss, batch_center


def make_dino_train_step(
    student_apply: Callable,  # (params, images, deterministic, rngs) -> (B, out_dim)
    tx: optax.GradientTransformation,
    cfg: DINOConfig,
    multicrop_fn: Optional[Callable] = None,  # (key, uint8 batch) -> (globals, locals)
):
    """Returns step(state, batch, rng) → (state, metrics).

    ``batch['images']`` is raw uint8 tiles (B, H, W, 3) when multicrop_fn is
    given, else a tuple of pre-made (globals (B,2,Sg,Sg,3), locals).
    """
    ema_sched = cosine_momentum_schedule(cfg.ema_base, cfg.ema_final, cfg.total_steps)
    temp_sched = teacher_temp_schedule(cfg)

    def step(state: DINOState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        crop_key, drop_key = jax.random.split(rng)
        if multicrop_fn is not None:
            g_views, l_views = multicrop_fn(crop_key, batch["images"])
        else:
            g_views, l_views = batch["globals"], batch["locals"]
        # (B, V, S, S, 3) → (V, B, S, S, 3)
        g_views = jnp.swapaxes(g_views, 0, 1)
        l_views = jnp.swapaxes(l_views, 0, 1)

        t_temp = temp_sched(state.step)
        momentum = ema_sched(state.step)

        # Independent stochastic-depth/dropout masks per view group and per
        # collection (reference torch semantics: every forward draws fresh
        # randomness; a shared key would correlate drop masks across views).
        g_drop, g_path, l_drop, l_path = jax.random.split(drop_key, 4)

        def compute_loss(params):
            # Student sees all views. Global views share one forward (stacked
            # on batch) — locals separately (different resolution).
            vg, b = g_views.shape[0], g_views.shape[1]
            s_g = student_apply(
                params,
                g_views.reshape((-1,) + g_views.shape[2:]),
                deterministic=False,
                rngs={"dropout": g_drop, "droppath": g_path},
            ).reshape(vg, b, -1)
            vl = l_views.shape[0]
            s_l = student_apply(
                params,
                l_views.reshape((-1,) + l_views.shape[2:]),
                deterministic=False,
                rngs={"dropout": l_drop, "droppath": l_path},
            ).reshape(vl, b, -1)
            s_out = jnp.concatenate([s_g, s_l], axis=0)

            t_out = student_apply(
                state.teacher_params,
                g_views.reshape((-1,) + g_views.shape[2:]),
                deterministic=True,
            ).reshape(vg, b, -1)
            t_out = jax.lax.stop_gradient(t_out)

            loss, batch_center = dino_loss(
                s_out.astype(jnp.float32),
                t_out.astype(jnp.float32),
                state.center,
                cfg.student_temp,
                t_temp,
                cfg.n_global,
                pair_dtype=jnp.bfloat16 if cfg.loss_pair_bf16 else jnp.float32,
            )
            return loss, batch_center

        (loss, batch_center), grads = jax.value_and_grad(
            compute_loss, has_aux=True
        )(state.student_params)

        if cfg.freeze_last_layer_steps > 0:
            # DINO trick: cancel last-layer grads for the first N steps.
            def maybe_zero(path, g):
                is_last = any(
                    getattr(p, "key", None) == "last_layer" for p in path
                )
                if is_last:
                    return jnp.where(
                        state.step < cfg.freeze_last_layer_steps,
                        jnp.zeros_like(g),
                        g,
                    )
                return g

            grads = jax.tree_util.tree_map_with_path(maybe_zero, grads)

        updates, new_opt_state = tx.update(
            grads, state.opt_state, state.student_params
        )
        new_student = optax.apply_updates(state.student_params, updates)
        new_teacher = ema_update(state.teacher_params, new_student, momentum)
        new_center = (
            state.center * cfg.center_momentum
            + batch_center * (1.0 - cfg.center_momentum)
        )
        new_state = DINOState(
            step=state.step + 1,
            student_params=new_student,
            teacher_params=new_teacher,
            opt_state=new_opt_state,
            center=new_center,
        )
        metrics = {
            "loss": loss,
            "teacher_temp": t_temp,
            "ema_momentum": momentum,
        }
        return new_state, metrics

    return step
