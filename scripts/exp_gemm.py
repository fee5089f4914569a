#!/usr/bin/env python
"""GEMM MFU calibration on the attached chip.

Runs the exact ViT-S forward GEMM sequence (qkv/proj/fc1/fc2 × 12 layers) on
the bench shapes, no attention/LN, and reports achieved TFLOP/s — the
realistic MXU ceiling that the full-step MFU should be judged against.
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 128 * 197  # global tokens
    d = 384
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (m, d), jnp.bfloat16)
    ws = {
        "qkv": jax.random.normal(key, (d, 3 * d), jnp.float32) * 0.02,
        "proj": jax.random.normal(key, (d, d), jnp.float32) * 0.02,
        "fc1": jax.random.normal(key, (d, 4 * d), jnp.float32) * 0.02,
        "fc2": jax.random.normal(key, (4 * d, d), jnp.float32) * 0.02,
    }

    def layer(x, ws):
        q = (x @ ws["qkv"].astype(jnp.bfloat16))[:, :d]
        x = x + q @ ws["proj"].astype(jnp.bfloat16)
        h = jax.nn.gelu(x @ ws["fc1"].astype(jnp.bfloat16), approximate=True)
        return x + h @ ws["fc2"].astype(jnp.bfloat16)

    @jax.jit
    def net(x, ws):
        for _ in range(12):
            x = layer(x, ws)
        return x.sum()

    float(net(x, ws))
    iters = 50
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = net(x, ws)
    float(out)
    dt = (time.perf_counter() - t0) / iters
    flops = 12 * 2 * m * d * (3 * d + d + 4 * d + 4 * d)
    print(
        f"M={m}: {dt*1e3:.2f} ms/iter, {flops/dt/1e12:.1f} TFLOP/s "
        f"({flops/dt/197e12*100:.0f}% of v5e bf16 peak)"
    )


if __name__ == "__main__":
    main()
