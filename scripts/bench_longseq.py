#!/usr/bin/env python
"""Long-sequence attention benchmark (SURVEY §5.7): MIL-bag / full-slide
token-stream lengths, where the whole-sequence wide kernel exceeds its VMEM
budget and the O(S) flash kernel (tiled, blockwise backward) takes over.

Measures fwd and fwd+bwd ms/call for the Pallas flash kernel vs XLA at
S = 512..16384 (ViT-S geometry: 6 heads × 64 head_dim), the long-bag regime
the reference never reaches (bags ≤ 500, datasets.py:830-837).

Usage: python scripts/bench_longseq.py [batch]
"""

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

from tpuwsi.ops.attention import attention_reference, fused_attention

H, HD = 6, 64
SCALE = HD ** -0.5


def timed_ms(fn, *args, n=10):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / n * 1e3


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    rng = np.random.default_rng(0)
    results = {}
    for s in (512, 2048, 8192, 16384):
        q, k, v = (
            jnp.asarray(rng.normal(0, 1, (b, H, s, HD)), jnp.bfloat16)
            for _ in range(3)
        )

        flash_f = jax.jit(lambda q, k, v: fused_attention(q, k, v, scale=SCALE))
        xla_f = jax.jit(lambda q, k, v: attention_reference(q, k, v, scale=SCALE))

        def loss_flash(q, k, v):
            return fused_attention(q, k, v, scale=SCALE).astype(jnp.float32).sum()

        def loss_xla(q, k, v):
            return attention_reference(q, k, v, scale=SCALE).astype(jnp.float32).sum()

        flash_g = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2)))
        xla_g = jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2)))

        row = {"flash_fwd_ms": round(timed_ms(flash_f, q, k, v), 3),
               "flash_fwdbwd_ms": round(timed_ms(flash_g, q, k, v), 3)}
        # XLA materializes the (S, S) scores in HBM — at S=16k that is a
        # ~26 GB f32 tensor (4·6·16384²·4 B) vs 16 GB HBM, so fwd AND bwd
        # both die; record the failure
        for name, fn in (("xla_fwd_ms", xla_f), ("xla_fwdbwd_ms", xla_g)):
            try:
                row[name] = round(timed_ms(fn, q, k, v), 3)
            except Exception as e:
                row[name] = f"OOM ({type(e).__name__})"
        results[f"S{s}"] = row
        print(f"S={s}", row, flush=True)
    print(json.dumps({"batch": b, "heads": H, "head_dim": HD, **results}))


if __name__ == "__main__":
    main()
