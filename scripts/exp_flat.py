#!/usr/bin/env python
"""A/B: 3-D (B,S,D)xD,F dots vs flattened (B*S,D) dots on TPU.

The round-3 HLO dump shows XLA lowering the ViT's rank-3 dense layers
through the TPU *convolution* emitter (dim_labels=0bf_io0->0bf,
EmitAllBatchInSublanes) at ~53% MXU. This measures whether a flat 2-D GEMM
form of the same math is faster, fwd and fwd+bwd, at DINO-step shapes.

Usage: python scripts/exp_flat.py
"""

from __future__ import annotations

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def timeit(f, *args, iters=50):
    r = f(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters * 1e3


def mlp_block(x, g, be, w1, b1, w2, b2):
    # pre-norm MLP sub-block, bf16 GEMMs, f32 LN — mirrors models/vit.py
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    ln = ((xf - mu) * jax.lax.rsqrt(var + 1e-6) * g + be).astype(jnp.bfloat16)
    h = jnp.dot(ln, w1, preferred_element_type=jnp.float32) + b1
    h = jax.nn.gelu(h.astype(jnp.bfloat16), approximate=True)
    y = jnp.dot(h, w2, preferred_element_type=jnp.float32) + b2
    return x + y.astype(x.dtype)


def main():
    B, S, D, F = 192, 197, 384, 1536
    key = jax.random.PRNGKey(0)
    x3 = jax.random.normal(key, (B, S, D), jnp.bfloat16)
    x2 = x3.reshape(B * S, D)
    g = jnp.ones((D,), jnp.float32)
    be = jnp.zeros((D,), jnp.float32)
    w1 = jax.random.normal(key, (D, F), jnp.bfloat16) * 0.02
    b1 = jnp.zeros((F,), jnp.float32)
    w2 = jax.random.normal(key, (F, D), jnp.bfloat16) * 0.02
    b2 = jnp.zeros((D,), jnp.float32)

    args = (g, be, w1, b1, w2, b2)
    f3 = jax.jit(mlp_block)
    f2 = jax.jit(mlp_block)
    print(f"fwd 3D  {timeit(f3, x3, *args):7.3f} ms")
    print(f"fwd 2D  {timeit(f2, x2, *args):7.3f} ms")

    def loss3(x, *a):
        return jnp.sum(mlp_block(x, *a).astype(jnp.float32))

    def loss2(x, *a):
        return jnp.sum(mlp_block(x, *a).astype(jnp.float32))

    g3 = jax.jit(jax.grad(loss3, argnums=(0, 3, 5)))
    g2 = jax.jit(jax.grad(loss2, argnums=(0, 3, 5)))
    print(f"bwd 3D  {timeit(g3, x3, *args):7.3f} ms")
    print(f"bwd 2D  {timeit(g2, x2, *args):7.3f} ms")

    # raw dots
    d3 = jax.jit(lambda x, w: jnp.dot(x, w, preferred_element_type=jnp.float32))
    print(f"dot 3D (B,S,D)x(D,F) {timeit(d3, x3, w1):7.3f} ms")
    print(f"dot 2D (BS,D)x(D,F)  {timeit(d3, x2, w1):7.3f} ms")
    hi3 = jax.random.normal(key, (B, S, F), jnp.bfloat16)
    hi2 = hi3.reshape(B * S, F)
    print(f"dot 3D (B,S,F)x(F,D) {timeit(d3, hi3, w2):7.3f} ms")
    print(f"dot 2D (BS,F)x(F,D)  {timeit(d3, hi2, w2):7.3f} ms")


if __name__ == "__main__":
    main()
