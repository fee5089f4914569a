#!/usr/bin/env python
"""Amortized attention-op cost: chain N dependent applications inside ONE jit
so per-dispatch overhead vanishes, and compare kernel implementations.

Usage: python scripts/exp_attn.py [batch] [seq]
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from tpuwsi.ops.attention import _mha_reference, mha_from_qkv

CHAIN = 24


def bench(name, fn, qkv, iters=20):
    @jax.jit
    def chained(qkv):
        x = qkv
        for _ in range(CHAIN):
            o = fn(x)  # (B, N, D)
            x = jnp.concatenate([o, o, o], axis=-1)
        return x.mean()

    @jax.jit
    def baseline(qkv):
        x = qkv
        d = x.shape[-1] // 3
        for _ in range(CHAIN):
            o = x[..., :d] * 1.000001
            x = jnp.concatenate([o, o, o], axis=-1)
        return x.mean()

    @jax.jit
    def chained_grad(qkv):
        return jax.grad(lambda q: chained(q))(qkv).mean()

    for f, tag in ((chained, "fwd"), (baseline, "base"), (chained_grad, "grad")):
        float(f(qkv))
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = f(qkv)
        float(out)
        dt = (time.perf_counter() - t0) / iters / CHAIN * 1e3
        print(f"{name:10s} {tag:5s} {dt:7.3f} ms/op")


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 197
    d = 384
    qkv = jax.random.normal(jax.random.PRNGKey(0), (b, n, 3 * d), jnp.bfloat16)
    bench("pallas", lambda x: mha_from_qkv(x, 6), qkv)
    bench("xla", lambda x: _mha_reference(x, 6, (d // 6) ** -0.5), qkv)


if __name__ == "__main__":
    main()
