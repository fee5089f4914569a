#!/usr/bin/env python
"""Weight-gradient GEMM experiment: XLA's tall-K reduction (dW = xT dy with
K = B*S ~ 38k rows) ran at 181 GB/s in the step profile. Compare a Pallas
row-sweep accumulation kernel (the fused-MLP recipe) at the exact shapes."""
import functools, sys, time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

def _cdiv(a, b):
    return -(-a // b)

TILE = 1024

def _wgrad_kernel(x_ref, dy_ref, dw_ref, dw_s, *, rows, tile):
    i = pl.program_id(0)
    n = pl.num_programs(0)
    @pl.when(i == 0)
    def _init():
        dw_s[:] = jnp.zeros_like(dw_s)
    rowi = i * tile + jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
    x = jnp.where(rowi < rows, x_ref[...], 0)
    dy = jnp.where(rowi < rows, dy_ref[...], 0)
    dw_s[:] += jax.lax.dot_general(
        x, dy, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    @pl.when(i == n - 1)
    def _fin():
        dw_ref[...] = dw_s[:]

def pallas_wgrad(x, dy, interpret=False):
    rows, d = x.shape
    f = dy.shape[1]
    tile = min(TILE, max(_cdiv(rows, 8) * 8, 8))
    return pl.pallas_call(
        functools.partial(_wgrad_kernel, rows=rows, tile=tile),
        grid=(_cdiv(rows, tile),),
        in_specs=[pl.BlockSpec((tile, d), lambda i: (i, 0)),
                  pl.BlockSpec((tile, f), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((d, f), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((d, f), jnp.float32),
        scratch_shapes=[pltpu.VMEM((d, f), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",), vmem_limit_bytes=int(3e7)),
        interpret=interpret,
    )(x, dy)

def xla_wgrad(x, dy):
    return jax.lax.dot_general(
        x, dy, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)

def bench(name, fn, x, dy, iters=30):
    @jax.jit
    def chained(x, dy):
        acc = 0.0
        for j in range(8):
            acc = acc + fn(x + j * 0.0, dy).sum()
        return acc
    float(chained(x, dy))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = chained(x, dy)
    float(out)
    dt = (time.perf_counter() - t0) / iters / 8 * 1e3
    print(f"{name:14s} {dt:7.3f} ms/op", flush=True)

def main():
    for rows, d, f in [(37824, 384, 1152), (37824, 384, 384), (21312, 384, 1152)]:
        print(f"--- rows={rows} d={d} f={f}")
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        x = jax.random.normal(k1, (rows, d), jnp.bfloat16)
        dy = jax.random.normal(k2, (rows, f), jnp.bfloat16)
        if "--check" in sys.argv:
            a = np.asarray(pallas_wgrad(x, dy, interpret=True))
            b = np.asarray(xla_wgrad(x, dy))
            err = np.abs(a - b).max() / (np.abs(b).max() + 1e-9)
            print(f"rel err {err:.2e}")
            assert err < 2e-2
            continue
        bench("pallas_wgrad", lambda x, dy: pallas_wgrad(x, dy), x, dy)
        bench("xla_wgrad", xla_wgrad, x, dy)

if __name__ == "__main__":
    main()
