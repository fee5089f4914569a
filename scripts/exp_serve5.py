#!/usr/bin/env python
"""Round-5 closing-accounting pass for the NON-DINO production shapes
(round-4 VERDICT item 7): per-region device-trace tables for

  (a) the supervised WSI train step — ViT-S/16 @ 256², on-device
      'cbnfrsc' recipe, AdamW, b64 (the run-book fine-tune recipe,
      reference train_instruct.txt:22-31), and
  (b) the serving/extraction eval forward — ViT-S/16 @ 256², b256,
      eval normalize + forward (reference validate()/--extract_features,
      train.py:1146-1345),

with the same trace ∩ category methodology the DINO step got for 4 rounds
(scripts/exp_trace3.py). Usage:

  python scripts/exp_serve5.py [sup|eval|both] [batch_sup] [batch_eval]
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
sys.path.insert(0, "/root/repo/scripts")

from exp_trace3 import analyze, parse, report  # noqa: E402

FLAGS = {
    "xla_tpu_enable_latency_hiding_scheduler": "true",
    "xla_tpu_rwb_fusion": "false",
    "xla_jf_conv_output_fusion": "false",
}


def supervised_step_parts(batch: int, aug_override=None):
    """ONE assembly of the run-book supervised step (ViT-S/16 @ 256²,
    on-device 'cbnfrsc', AdamW+EMA) shared by every supervised exp script
    (exp_sup5 imports this — hand-copied builders drift from the measured
    config, the round-4 review lesson). ``aug_override(recipe)`` may wrap
    or replace the recipe-built augment_fn. Returns (state, raw_step,
    batch_dict, rng)."""
    from tpuwsi.models.registry import create_model
    from tpuwsi.preprocess.recipes import make_recipe
    from tpuwsi.train import OptimConfig, make_optimizer
    from tpuwsi.train.state import create_train_state
    from tpuwsi.train.supervised import make_train_step

    model = create_model(
        "vit_small_patch16_224", num_classes=2, img_size=256,
        use_pallas_attention=True, attn_save_probs=True,
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3), jnp.float32))
    tx, _ = make_optimizer(
        OptimConfig(opt="adamw", lr=1e-4, weight_decay=1e-2), params,
        global_batch_size=batch)
    state = create_train_state(params, tx, ema=True)
    recipe = make_recipe("cbnfrsc", train=True, tile_size=256)
    aug = aug_override(recipe) if aug_override is not None else recipe
    step = make_train_step(model.apply, tx, augment_fn=aug,
                           compute_auc=True, ema_decay=0.9998)
    imgs = np.random.randint(0, 255, (batch, 256, 256, 3), dtype=np.uint8)
    b = {"images": jnp.asarray(imgs),
         "labels": jnp.asarray(np.arange(batch) % 2)}
    return state, step, b, jax.random.PRNGKey(1)


def build_supervised(batch: int):
    state, step, b, rng = supervised_step_parts(batch)
    jit = jax.jit(step).lower(state, b, rng).compile(compiler_options=FLAGS)

    def run():
        nonlocal state
        state, m = jit(state, b, rng)
        return m["loss"]

    return run


def build_eval(batch: int):
    import dataclasses

    from tpuwsi.models.vit import VisionTransformer, vit_small
    from tpuwsi.preprocess.recipes import make_recipe
    from tpuwsi.train.state import TrainState
    from tpuwsi.train.supervised import make_eval_step

    model = VisionTransformer(vit_small(
        num_classes=2, img_size=256, use_pallas_attention=True,
        use_fused_mlp=False, ln_dtype=jnp.bfloat16, gelu_approx=True,
    ))
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 256, 256, 3), jnp.float32))
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=(), ema_params=None)
    norm = make_recipe("none", train=False, tile_size=256)
    step = make_eval_step(
        model.apply,
        preprocess_fn=lambda im: norm(jax.random.PRNGKey(0), im))
    imgs = np.random.randint(0, 255, (batch, 256, 256, 3), dtype=np.uint8)
    b = {"images": jnp.asarray(imgs)}
    jit = jax.jit(step).lower(state, b).compile(compiler_options=FLAGS)

    def run():
        return jit(state, b)[1]

    return run


def trace(tag: str, run, n_warm: int = 8, n_trace: int = 3):
    import shutil

    out = run()
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(n_warm):
        out = run()
    np.asarray(out)
    dt = (time.perf_counter() - t0) / n_warm
    logdir = f"/tmp/trace5_{tag}"
    shutil.rmtree(logdir, ignore_errors=True)
    jax.profiler.start_trace(logdir)
    for _ in range(n_trace):
        out = run()
    np.asarray(out)
    jax.profiler.stop_trace()
    events = parse(logdir)
    report(tag, dt, *analyze(events, n_steps=n_trace))


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    b_sup = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    b_eval = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    if which in ("sup", "both"):
        trace(f"supervised_b{b_sup}", build_supervised(b_sup))
    if which in ("eval", "both"):
        trace(f"eval_b{b_eval}", build_eval(b_eval))


if __name__ == "__main__":
    main()
