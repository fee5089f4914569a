#!/usr/bin/env python
"""Flagship-config SSL learning demonstration on the real chip.

e2e_slice.py proves the DINO loop learns with a small backbone; this runs
the LITERAL production program — ``tpuwsi.cli.train.ssl_step_bundle`` with
the run-book SSL recipe (bench.py's exact argv: ViT-S/16, 2×224² + 6×96²
multi-crop, AdamW + warmup-cosine, grad-clip 3.0, drop-path 0.1, the
adopted tuned config) — on the 8-class texture pool, and asserts the same
learned-margin kNN criteria (≥2× chance, ≥ random-init + 15 pts).

The only departures from the run-book argv are slice-scale hygiene, both
through the CLI's own flags: --ema-base 0.9995 (at batch 48 the
default-momentum teacher follows the student into uniform collapse —
measured round 4) and batch 48 (b96 fits, but 48 keeps the run short).

Usage: python scripts/e2e_flagship.py [steps=6000] [batch=48]
"""

from __future__ import annotations

import sys
import time

import jax

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

# e2e_slice sets the machine-fingerprinted compile-cache dir at import
# time — importing it FIRST is what configures jax for this script too
from e2e_slice import (  # noqa: E402
    N_TEXTURE_CLASSES,
    _texture_tiles,
    assert_ssl_learning,
    texture_probe,
)


def main(steps: int = 6000, batch: int = 48):
    from bench import bench_args
    from tpuwsi.cli.train import ssl_step_bundle

    args = bench_args()
    args.ema_base = 0.9995  # slice-scale teacher momentum (see docstring)
    b = ssl_step_bundle(args, steps_per_epoch=max(1, steps // args.epochs),
                        global_batch=batch)
    step = jax.jit(b.raw_step)
    if jax.default_backend() == "tpu":
        # adopted production flags (bench.py)
        imgs0 = np.zeros((batch, 256, 256, 3), np.uint8)
        step = step.lower(
            b.state, {"images": jnp.asarray(imgs0)}, jax.random.PRNGKey(0)
        ).compile(compiler_options={
            "xla_tpu_enable_latency_hiding_scheduler": "true",
            "xla_tpu_rwb_fusion": "false",
            "xla_jf_conv_output_fusion": "false",
        })

    rng = np.random.default_rng(0)
    per_class = 40
    pool = jnp.asarray(np.concatenate([
        _texture_tiles(rng, per_class, cls)
        for cls in range(N_TEXTURE_CLASSES)
    ]))
    pool_n = int(pool.shape[0])
    key_base = jax.random.PRNGKey(1)

    state = b.state
    losses = []
    t0 = time.perf_counter()
    for it in range(steps):
        idx = np.random.default_rng(555_000 + it).choice(
            pool_n, size=batch, replace=False)
        imgs = jnp.take(pool, jnp.asarray(idx), axis=0)
        state, m = step(state, {"images": imgs},
                        jax.random.fold_in(key_base, it))
        losses.append(m["loss"])
        if it % 500 == 0:
            print(f"step {it:5d} dino-loss {float(m['loss']):.4f} "
                  f"({(time.perf_counter() - t0):.0f}s)", flush=True)
    losses = [float(x) for x in losses]
    dt = time.perf_counter() - t0
    print(f"{steps} steps in {dt:.0f}s = {batch * steps / dt:.0f} source "
          f"tiles/s sustained (per-call dispatch)")

    # 8-class kNN probe on the teacher backbone at the production 224² view
    # (shared probe + assertion criteria with e2e_slice — short runs get
    # the smoke assertions there too, so a broken step can't print OK)
    acc_init, acc = texture_probe(
        b.model.backbone, rng, crop=224, batch=32,
        params_list=[
            {"params": b.params["params"]["backbone"]},
            {"params": state.teacher_params["params"]["backbone"]},
        ],
    )
    assert_ssl_learning(losses, args.dino_out_dim, acc, acc_init, steps,
                        tag="flagship dino")
    print("flagship ssl OK")


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 6000,
        int(sys.argv[2]) if len(sys.argv) > 2 else 48,
    )
