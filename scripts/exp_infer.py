#!/usr/bin/env python
"""Serving-path probe: pure ViT-S/16 eval forward throughput vs attention
dispatch and batch size. The first bench_infer.py run measured ~50 ms for a
b256 forward (≈25% MFU) vs the training step's forward region at 84% MFU —
find where the slack is: per-call dispatch, attention path, batch size, or
the missing scan amortization."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def build(use_pallas: bool):
    from tpuwsi.models.vit import VisionTransformer, vit_small

    model = VisionTransformer(
        vit_small(
            num_classes=2, img_size=224, use_pallas_attention=use_pallas,
            use_fused_mlp=False, ln_dtype=jnp.bfloat16, gelu_approx=True,
        )
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3), jnp.float32)
    )
    return model, params


def timed(fn, *args, n=20):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / n


def main():
    results = {}
    for pallas in (True, False):
        model, params = build(pallas)
        fwd = jax.jit(
            lambda p, x: model.apply(p, x, deterministic=True)
        )
        for b in (128, 256, 512):
            x = jnp.asarray(
                np.random.randn(b, 224, 224, 3).astype(np.float32)
            )
            dt = timed(fwd, params, x)
            key = f"{'pallas' if pallas else 'xla'}_b{b}"
            results[key] = {
                "ms": round(dt * 1e3, 2),
                "tiles_per_sec": round(b / dt, 1),
            }
            print(key, results[key], flush=True)

    # scan-amortized variant: K sequential forwards in one dispatch
    model, params = build(True)
    K = 8
    b = 256
    x = jnp.asarray(np.random.randn(b, 224, 224, 3).astype(np.float32))

    def multi(p, x):
        def body(carry, i):
            # vary the input per iteration — a loop-invariant body gets
            # hoisted by XLA and the scan measures ONE forward (first run
            # of this probe reported exactly 48/8 ms)
            out = model.apply(p, x + carry, deterministic=True)
            return out.mean().astype(x.dtype) * 1e-6, out.sum()
        return jax.lax.scan(body, jnp.zeros((), x.dtype), jnp.arange(K))

    mfwd = jax.jit(multi)
    dt = timed(mfwd, params, x, n=5) / K
    results["pallas_b256_scanK8"] = {
        "ms": round(dt * 1e3, 2),
        "tiles_per_sec": round(b / dt, 1),
    }
    print("pallas_b256_scanK8", results["pallas_b256_scanK8"], flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
