#!/usr/bin/env python
"""Is the bench dispatch-bound?  The round-3 b128 trace shows each jit_step
occupies only ~47 ms of DEVICE time while wall is ~146-152 ms/step — i.e.
~100 ms/step is host→tunnel dispatch latency, not TPU execution (the
exp_trace3 category table sums 3 traced steps; earlier readings treated the
sums as per-step values and missed this).

A/B: the per-call dispatch loop (bench.py today) vs ONE jit'd lax.scan of K
train steps carrying the state (same resident batch, per-step folded rng —
the device work per step is identical).  If wall/step under scan drops to
~device span, the missing throughput is dispatch, and the bench + CLI loops
should offer a scanned multi-step driver.

Usage: python scripts/exp_scan_steps.py [batch] [K]
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


def main():
    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from bench import build
    from tpuwsi.models import DINOHead
    from tpuwsi.models.vit import VisionTransformer, vit_small
    from tpuwsi.preprocess.multicrop import MultiCropConfig, make_multicrop
    from tpuwsi.ssl_dino import DINOConfig, make_dino_train_step
    from tpuwsi.train import OptimConfig, make_optimizer

    state, step = build(batch_size)
    rng = jax.random.PRNGKey(1)
    imgs = np.random.randint(0, 255, (batch_size, 256, 256, 3), dtype=np.uint8)
    batch = {"images": jnp.asarray(imgs)}

    # --- A: per-call dispatch (bench.py loop) ---
    step_c = step.lower(state, batch, rng).compile(
        compiler_options={"xla_tpu_enable_latency_hiding_scheduler": "true"}
    )
    st, m = step_c(state, batch, rng)
    float(m["loss"])
    n = 20
    t0 = time.perf_counter()
    for i in range(n):
        st, m = step_c(st, batch, rng)
        if i % 4 == 3:
            float(m["loss"])
    float(m["loss"])
    dt_a = (time.perf_counter() - t0) / n
    print(f"per-call dispatch: {dt_a*1e3:8.1f} ms/step  "
          f"{batch_size*8/dt_a:8.0f} views/s", flush=True)

    # --- B: K steps inside one jit via lax.scan ---
    raw = make_dino_train_step(
        *_rebuild_raw(batch_size)
    )

    def multi(state, batch, rng):
        def body(carry, i):
            st = carry
            st, m = raw(st, batch, jax.random.fold_in(rng, i))
            return st, m["loss"]
        return jax.lax.scan(body, state, jnp.arange(K))

    multi_c = (
        jax.jit(multi)
        .lower(state, batch, rng)
        .compile(compiler_options={
            "xla_tpu_enable_latency_hiding_scheduler": "true"})
    )
    st, losses = multi_c(state, batch, rng)
    np.asarray(losses)
    n_out = max(20 // K, 3)
    t0 = time.perf_counter()
    for i in range(n_out):
        st, losses = multi_c(st, batch, rng)
        np.asarray(losses)
    dt_b = (time.perf_counter() - t0) / (n_out * K)
    print(f"scan K={K:3d}:        {dt_b*1e3:8.1f} ms/step  "
          f"{batch_size*8/dt_b:8.0f} views/s", flush=True)


def _rebuild_raw(batch_size):
    """Same model/optimizer as bench.build, returning the UNJITTED step fn
    args (bench.build jits internally; scan needs the raw fn)."""
    from tpuwsi.models import DINOHead
    from tpuwsi.models.vit import VisionTransformer, vit_small
    from tpuwsi.preprocess.multicrop import MultiCropConfig, make_multicrop
    from tpuwsi.ssl_dino import DINOConfig, DINOModel
    from tpuwsi.train import OptimConfig, make_optimizer

    on_tpu = jax.default_backend() == "tpu"
    backbone = VisionTransformer(
        vit_small(num_classes=0, img_size=224, use_pallas_attention=on_tpu,
                  use_fused_mlp=False,
                  ln_dtype=jnp.bfloat16 if on_tpu else jnp.float32,
                  gelu_approx=True)
    )
    model = DINOModel(
        backbone=backbone,
        head=DINOHead(out_dim=65536, hidden_dim=2048, bottleneck_dim=256,
                      gelu_approx=True,
                      dtype=jnp.bfloat16 if on_tpu else jnp.float32),
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3), jnp.float32)
    )
    dcfg = DINOConfig(out_dim=65536, n_local=6, total_steps=1000,
                      loss_pair_bf16=on_tpu)
    ocfg = OptimConfig(opt="adamw", lr=5e-4, weight_decay=0.04)
    tx, _ = make_optimizer(ocfg, params, global_batch_size=batch_size)
    # match bench.build's TPU augmentation dtype — an f32 multicrop here
    # would add ~4-8 ms/step of extra device work to the per-call arm and
    # misattribute it to dispatch latency (review finding r3)
    mc = make_multicrop(MultiCropConfig(
        global_size=224, local_size=96, n_local=6,
        compute_dtype="bfloat16" if on_tpu else "float32",
    ))
    return model.apply, tx, dcfg, mc


if __name__ == "__main__":
    main()
