#!/usr/bin/env python
"""Isolated wide-MHA kernel timings at the DINO step's exact shapes.

Quantifies the remaining in-kernel slack after the round-4 saved-probs
adoption: fwd and fwd+bwd per variant (recompute vs saved-p) against the
dots-only MXU floor, for the two shapes the step dispatches —
globals (192, 197, 1152) and packed locals (192, 111, 1152) bf16.

Each timed call runs a K-iteration lax.scan whose input varies per
iteration (carry-dependent epsilon) — see the verify skill's
loop-invariant-hoisting trap.

Usage: python scripts/exp_attn4b.py [K]
"""

from __future__ import annotations

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, "/root/repo")

from tpuwsi.ops.attention import _mha_qkv, _mha_qkv_saved  # noqa: E402

K = int(sys.argv[1]) if len(sys.argv) > 1 else 32
HEADS, D = 6, 384
SHAPES = {
    "globals": (192, 197, 0),   # (B, N, block_len 0 -> whole seq)
    "locals": (192, 111, 37),   # 3x 37-token crops packed per program
}
SCALE = (D // HEADS) ** -0.5


def timed(fn, qkv, iters=3):
    def body(carry, _):
        out = fn(qkv + carry)
        s = jnp.sum(out.astype(jnp.float32))
        return carry + (s * 0).astype(carry.dtype) + jnp.bfloat16(1e-6), s

    run = jax.jit(lambda q0: jax.lax.scan(body, jnp.bfloat16(0.0),
                                          None, length=K)[1])
    np.asarray(run(qkv))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        np.asarray(run(qkv))
    return (time.perf_counter() - t0) / (iters * K) * 1e3


def main():
    rng = np.random.default_rng(0)
    for name, (b, n, blk) in SHAPES.items():
        qkv = jnp.asarray(rng.normal(0, 1, (b, n, 3 * D)), jnp.bfloat16)

        def fwd_base(x):
            return _mha_qkv(x, HEADS, SCALE, False, blk)

        def fwd_saved(x):
            return _mha_qkv_saved(x, HEADS, SCALE, False, blk)

        def fb(f):
            def loss(x):
                return jnp.sum(f(x).astype(jnp.float32) ** 2)
            return jax.grad(loss)

        r = {
            "fwd base": timed(fwd_base, qkv),
            "fwd saved": timed(fwd_saved, qkv),
            "fwd+bwd base": timed(fb(fwd_base), qkv),
            "fwd+bwd saved": timed(fb(fwd_saved), qkv),
        }
        for k, v in r.items():
            print(f"{name:8s} {k:14s} {v:7.3f} ms", flush=True)
        # dots-only MXU floor for this shape: fwd 2 dots, bwd 4 (saved) per
        # head over (S_pad, hd)x(hd, S_pad) and (S_pad, S_pad)x(S_pad, hd)
        seq_pad = max((n + 127) // 128 * 128, 128)
        hd = D // HEADS
        dot_flops = 2 * seq_pad * seq_pad * hd * 2  # QK^T + PV, per head
        total_fwd = b * HEADS * dot_flops
        # K=hd dots run at <=50% MXU (hd=64 of 128 contraction lanes)
        eff_tf = 201e12
        print(f"{name:8s} fwd dot-floor ~{total_fwd / eff_tf * 1e3:7.3f} ms "
              f"(at chain-peak; QK^T halves on K=64)", flush=True)


if __name__ == "__main__":
    main()
