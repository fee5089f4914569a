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

from tpuwsi.core.compile import machine_cache_dir  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir", machine_cache_dir("/root/repo/.jax_cache")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from e2e_slice import N_TEXTURE_CLASSES, _texture_tiles  # noqa: E402


def main(steps: int = 6000, batch: int = 48):
    from bench import bench_args
    from tpuwsi.cli.train import ssl_step_bundle
    from tpuwsi.ssl_dino import knn_accuracy

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
    n_probe = 32
    labels = np.repeat(np.arange(N_TEXTURE_CLASSES), n_probe)
    probe = np.concatenate([
        _texture_tiles(rng, n_probe, cls) for cls in range(N_TEXTURE_CLASSES)
    ])
    c0 = (256 - 224) // 2
    crops = probe[:, c0:c0 + 224, c0:c0 + 224].astype(np.float32) / 255.0
    tr = np.concatenate([
        np.arange(i * n_probe, i * n_probe + 24)
        for i in range(N_TEXTURE_CLASSES)
    ])
    te = np.concatenate([
        np.arange(i * n_probe + 24, (i + 1) * n_probe)
        for i in range(N_TEXTURE_CLASSES)
    ])
    backbone = b.model.backbone

    def probe_acc(backbone_params):
        feats = []
        for i in range(0, len(crops), 32):
            f = backbone.apply(backbone_params, jnp.asarray(crops[i:i + 32]),
                               deterministic=True)
            feats.append(np.asarray(f, np.float32))
        feats = np.concatenate(feats)
        return float(knn_accuracy(
            jnp.asarray(feats[tr]), jnp.asarray(labels[tr]),
            jnp.asarray(feats[te]), jnp.asarray(labels[te]), k=10,
        ))

    acc_init = probe_acc({"params": b.params["params"]["backbone"]})
    acc = probe_acc({"params": state.teacher_params["params"]["backbone"]})

    n = len(losses)
    p0, p1 = max(1, n // 10), max(2, int(n * 0.27))
    plateau = float(np.mean(losses[p0:p1]))
    final = float(np.mean(losses[-max(2, n // 15):]))
    lnk = float(np.log(args.dino_out_dim))
    chance = 1.0 / N_TEXTURE_CLASSES
    print(f"flagship dino plateau {plateau:.4f} -> final {final:.4f} "
          f"(ln K={lnk:.4f})  kNN[{N_TEXTURE_CLASSES}-class] "
          f"init {acc_init:.3f} -> trained {acc:.3f} (chance {chance:.3f})")
    if steps >= 1500:
        assert final < lnk, (final, lnk)
        assert final < plateau - 0.002, (plateau, final)
        assert acc >= 2 * chance, (acc, chance)
        assert acc >= acc_init + 0.15, (acc, acc_init)
    print("flagship ssl OK")


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 6000,
        int(sys.argv[2]) if len(sys.argv) > 2 else 48,
    )
