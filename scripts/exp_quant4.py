#!/usr/bin/env python
"""Scan-amortized device-compute A/B: f32/bf16 vs int8 feature extraction.

bench_infer's serialized/pipelined rates carry ~21-55 ms of tunnel
dispatch+fetch that varies minute-to-minute (the two modes compile and run
minutes apart), which buried the int8 delta in noise. This measures the
pure device forward: K=16 chained forwards per dispatch (carry-dependent
input so XLA cannot hoist the loop body — verify-skill trap), fetched sum.
"""

from __future__ import annotations

import dataclasses
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

K = 16
N_CALLS = 4


def run(name: str, quant: bool, batch: int, tile: int = 256,
        arch: str = "small") -> float:
    from tpuwsi.models import vit as vitmod
    from tpuwsi.models.vit import VisionTransformer
    from tpuwsi.ops.quant import quantize_vit_params
    from tpuwsi.preprocess.recipes import make_recipe

    cfg = getattr(vitmod, f"vit_{arch}")(
        num_classes=0, img_size=tile, use_pallas_attention=True,
        use_fused_mlp=False, ln_dtype=jnp.bfloat16, gelu_approx=True,
        quant_int8=quant,
    )
    model = VisionTransformer(cfg)
    params = VisionTransformer(
        dataclasses.replace(cfg, quant_int8=False)
    ).init(jax.random.PRNGKey(0), jnp.zeros((1, tile, tile, 3), jnp.float32))
    if quant:
        params = quantize_vit_params(params)
    norm = make_recipe("none", train=False, tile_size=tile)

    def multi(p, imgs):
        x = norm(jax.random.PRNGKey(0), imgs)

        def body(carry, i):
            out = model.apply(p, x + carry, deterministic=True)
            return out.mean() * 1e-6, out.sum()

        return jax.lax.scan(body, jnp.zeros((), x.dtype), jnp.arange(K))

    imgs = jnp.asarray(
        np.random.randint(0, 255, (batch, tile, tile, 3), dtype=np.uint8))
    t0 = time.perf_counter()
    step = jax.jit(multi)
    _, s = step(params, imgs)
    np.asarray(s)
    print(f"{name:6s} compiled+warm in {time.perf_counter()-t0:.0f}s",
          flush=True)
    t0 = time.perf_counter()
    for _ in range(N_CALLS):
        _, s = step(params, imgs)
        np.asarray(s)
    dt = (time.perf_counter() - t0) / (N_CALLS * K)
    print(f"{name:6s} {dt*1e3:8.2f} ms/forward  {batch/dt:9.1f} tiles/s",
          flush=True)
    return dt


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    arch = sys.argv[2] if len(sys.argv) > 2 else "small"
    res = {n: run(n, q, batch, arch=arch)
           for n, q in (("base", False), ("int8", True))}
    d = res["base"] / res["int8"]
    print(f"\nint8 speedup: {d:.3f}x")


if __name__ == "__main__":
    main()
