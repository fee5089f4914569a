#!/usr/bin/env python
"""A/B the saved-probs attention backward at the SUPERVISED step shape.

attn_save_probs won +2.3% on the DINO multi-crop step (exp_attn4) where
the sequence axis is dominated by packed 36-token locals. The supervised
WSI step is a different shape — one 256-token view per sample — so the
adoption for cli.train's supervised path (models/registry.create_model)
gets its own full-step measurement: ViT-S/16 @ 256^2, b64, on-device
'cbnfrsc' recipe, AdamW — the run-book fine-tune recipe minus data
plumbing.
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

FLAGS = {
    "xla_tpu_enable_latency_hiding_scheduler": "true",
    "xla_tpu_rwb_fusion": "false",
    "xla_jf_conv_output_fusion": "false",
}

K = 32
N_CALLS = 3


def run(name: str, save_probs: bool, batch: int) -> float:
    from tpuwsi.models.registry import create_model
    from tpuwsi.preprocess.recipes import make_recipe
    from tpuwsi.train import OptimConfig, make_optimizer
    from tpuwsi.train.state import create_train_state
    from tpuwsi.train.supervised import make_train_step

    model = create_model(
        "vit_small_patch16_224", num_classes=2, img_size=256,
        use_pallas_attention=True, attn_save_probs=save_probs,
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3), jnp.float32))
    ocfg = OptimConfig(opt="adamw", lr=1e-4, weight_decay=0.05,
                       sched="cosine", epochs=10, steps_per_epoch=1000)
    tx, _ = make_optimizer(ocfg, params, batch)
    state = create_train_state(params, tx)
    aug = make_recipe("cbnfrsc", tile_size=256, train=True)
    raw_step = make_train_step(model.apply, tx, augment_fn=aug)

    def multi(state, b, rng):
        def body(carry, i):
            st, m = raw_step(carry, b, jax.random.fold_in(rng, i))
            return st, m["loss"]
        return jax.lax.scan(body, state, jnp.arange(K))

    rng = jax.random.PRNGKey(1)
    imgs = np.random.randint(0, 255, (batch, 256, 256, 3), dtype=np.uint8)
    lbls = np.random.randint(0, 2, (batch,), dtype=np.int32)
    b = {"images": jnp.asarray(imgs), "labels": jnp.asarray(lbls)}
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
    print(f"{name:8s} {dt*1e3:8.2f} ms/step  {batch/dt:9.1f} tiles/s",
          flush=True)
    return dt


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    res = {n: run(n, sp, batch)
           for n, sp in (("base", False), ("savep", True))}
    d = res["base"] - res["savep"]
    print(f"\nsavep delta: {d*1e3:+.2f} ms/step "
          f"({100*d/res['base']:+.1f}%)")


if __name__ == "__main__":
    main()
