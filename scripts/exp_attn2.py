#!/usr/bin/env python
"""Attention kernel variant ladder — find where the 40ms step region goes.

Variants (fwd only first, then grads):
  ref      : XLA reference
  cur      : current per-head-loop whole-seq kernel (attention.py)
  dots     : current kernel minus softmax (MXU-only ladder rung)
  widesm   : 6 small QK dots -> ONE wide softmax over (H*S, S) -> 6 small PV
  blockdiag: block-diagonal K/V scratch -> 2 full-shape MXU dots + MXU
             normalizer (ones block-diag) -> one elementwise divide

Usage: python scripts/exp_attn2.py [batch] [seq] [--interpret]
"""

import functools
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from tpuwsi.ops.attention import _mha_reference, _mha_qkv_forward

NEG_INF = -1e30


def _cdiv(a, b):
    return -(-a // b)


# ---------------------------------------------------------------------------
# dots-only rung: current structure, softmax replaced by cast (MXU floor)
# ---------------------------------------------------------------------------


def _dots_kernel(len_ref, qkv_ref, o_ref, *, num_heads, seq_pad, scale):
    qkv = qkv_ref[0]
    d = qkv.shape[1] // 3
    hd = d // num_heads
    for h in range(num_heads):
        q = qkv[:, h * hd : (h + 1) * hd]
        k = qkv[:, d + h * hd : d + (h + 1) * hd]
        v = qkv[:, 2 * d + h * hd : 2 * d + (h + 1) * hd]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        o = jax.lax.dot_general(
            s.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, :, h * hd : (h + 1) * hd] = o.astype(o_ref.dtype)


# ---------------------------------------------------------------------------
# widesm: small dots, wide softmax
# ---------------------------------------------------------------------------


def _widesm_kernel(len_ref, qkv_ref, o_ref, st_ref, *, num_heads, seq_pad,
                   scale):
    qkv = qkv_ref[0]
    d = qkv.shape[1] // 3
    hd = d // num_heads
    n = len_ref[0]
    q_all = (qkv[:, :d].astype(jnp.float32) * scale).astype(qkv.dtype)
    for h in range(num_heads):
        q = q_all[:, h * hd : (h + 1) * hd]
        k = qkv[:, d + h * hd : d + (h + 1) * hd]
        st_ref[h * seq_pad : (h + 1) * seq_pad, :] = jax.lax.dot_general(
            k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
    # wide masked softmax over keys (= rows within each head block)
    st = st_ref[:]
    rowj = jax.lax.broadcasted_iota(
        jnp.int32, (num_heads * seq_pad, seq_pad), 0
    )
    st = jnp.where((rowj % seq_pad) < n, st, NEG_INF)
    s3 = st.reshape(num_heads, seq_pad, seq_pad)
    m = jnp.max(s3, axis=1, keepdims=True)
    e = jnp.exp(s3 - m)
    l = jnp.sum(e, axis=1, keepdims=True)
    p = (e / l).reshape(num_heads * seq_pad, seq_pad).astype(qkv.dtype)
    for h in range(num_heads):
        v = qkv[:, 2 * d + h * hd : 2 * d + (h + 1) * hd]
        o = jax.lax.dot_general(
            p[h * seq_pad : (h + 1) * seq_pad, :], v,
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        o_ref[0, :, h * hd : (h + 1) * hd] = o.astype(o_ref.dtype)


# ---------------------------------------------------------------------------
# widesm backward: recompute p wide, all-head wide VPU, bf16 dots
# ---------------------------------------------------------------------------


def _widesm_bwd_kernel(len_ref, qkv_ref, g_ref, dqkv_ref, st_ref, ds_ref, *,
                       num_heads, seq_pad, scale):
    qkv = qkv_ref[0]
    g = g_ref[0]
    d = qkv.shape[1] // 3
    hd = d // num_heads
    R = num_heads * seq_pad
    n = len_ref[0]
    q_all = (qkv[:, :d].astype(jnp.float32) * scale).astype(qkv.dtype)
    for h in range(num_heads):
        k = qkv[:, d + h * hd : d + (h + 1) * hd]
        st_ref[h * seq_pad : (h + 1) * seq_pad, :] = jax.lax.dot_general(
            k, q_all[:, h * hd : (h + 1) * hd],
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        )  # (S_k, S_q)
    rowj = jax.lax.broadcasted_iota(jnp.int32, (R, seq_pad), 0)
    st = jnp.where((rowj % seq_pad) < n, st_ref[:], NEG_INF)
    s3 = st.reshape(num_heads, seq_pad, seq_pad)
    m = jnp.max(s3, axis=1, keepdims=True)
    e = jnp.exp(s3 - m)
    l = jnp.sum(e, axis=1, keepdims=True)
    p = (e / l).reshape(R, seq_pad)  # f32 [h*S+j, i]
    for h in range(num_heads):
        v = qkv[:, 2 * d + h * hd : 2 * d + (h + 1) * hd]
        gh = g[:, h * hd : (h + 1) * hd]
        # dp[j, i] = sum_c v[j,c] g[i,c]
        ds_ref[h * seq_pad : (h + 1) * seq_pad, :] = jax.lax.dot_general(
            v, gh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # dv[j, c] = sum_i p[j,i] g[i,c]  (write now; p row block ready)
        dv = jax.lax.dot_general(
            p[h * seq_pad : (h + 1) * seq_pad, :].astype(gh.dtype), gh,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        dqkv_ref[0, :, 2 * d + h * hd : 2 * d + (h + 1) * hd] = dv.astype(
            dqkv_ref.dtype
        )
    dp3 = ds_ref[:].reshape(num_heads, seq_pad, seq_pad)
    p3 = p.reshape(num_heads, seq_pad, seq_pad)
    t3 = jnp.sum(p3 * dp3, axis=1, keepdims=True)
    ds = ((p3 * (dp3 - t3) * scale).reshape(R, seq_pad)).astype(
        qkv.dtype
    )  # scale folded once for dq & dk
    for h in range(num_heads):
        dsh = ds[h * seq_pad : (h + 1) * seq_pad, :]
        k = qkv[:, d + h * hd : d + (h + 1) * hd]
        q = qkv[:, h * hd : (h + 1) * hd]
        # dq[i, c] = sum_j ds[j,i] k[j,c]
        dq = jax.lax.dot_general(
            dsh, k, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # dk[j, c] = sum_i ds[j,i] q[i,c]
        dk = jax.lax.dot_general(
            dsh, q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dqkv_ref[0, :, h * hd : (h + 1) * hd] = dq.astype(dqkv_ref.dtype)
        dqkv_ref[0, :, d + h * hd : d + (h + 1) * hd] = dk.astype(
            dqkv_ref.dtype
        )


def widesm_bwd_call(qkv, g, num_heads, scale, interpret=False):
    b, n, d3 = qkv.shape
    seq_pad = max(_cdiv(n, 128) * 128, 128)
    if seq_pad != n:
        qkv = jnp.pad(qkv, ((0, 0), (0, seq_pad - n), (0, 0)))
        g = jnp.pad(g, ((0, 0), (0, seq_pad - n), (0, 0)))
    lengths = jnp.full((1,), n, dtype=jnp.int32)
    d = d3 // 3
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, seq_pad, d3), lambda i, lens: (i, 0, 0)),
            pl.BlockSpec((1, seq_pad, d), lambda i, lens: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, seq_pad, d3), lambda i, lens: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((num_heads * seq_pad, seq_pad), jnp.float32),
            pltpu.VMEM((num_heads * seq_pad, seq_pad), jnp.float32),
        ],
    )
    dqkv = pl.pallas_call(
        functools.partial(
            _widesm_bwd_kernel, num_heads=num_heads, seq_pad=seq_pad,
            scale=scale,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, seq_pad, d3), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(lengths, qkv, g)
    return dqkv[:, :n, :]


# ---------------------------------------------------------------------------
# blockdiag: 2 full-shape dots + MXU normalizer
# ---------------------------------------------------------------------------


def _blockdiag_kernel(len_ref, qkv_ref, o_ref, kbd_ref, vbd_ref, ones_ref, *,
                      num_heads, seq_pad, scale):
    i = pl.program_id(0)
    qkv = qkv_ref[0]
    d = qkv.shape[1] // 3
    hd = d // num_heads
    R = num_heads * seq_pad
    n = len_ref[0]

    @pl.when(i == 0)
    def _init():
        kbd_ref[:] = jnp.zeros_like(kbd_ref)
        vbd_ref[:] = jnp.zeros_like(vbd_ref)
        row = jax.lax.broadcasted_iota(jnp.int32, (R, d), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (R, d), 1)
        ones_ref[:] = ((row // seq_pad) == (col // hd)).astype(ones_ref.dtype)

    for h in range(num_heads):
        kbd_ref[h * seq_pad : (h + 1) * seq_pad, h * hd : (h + 1) * hd] = (
            qkv[:, d + h * hd : d + (h + 1) * hd]
        )
        vbd_ref[h * seq_pad : (h + 1) * seq_pad, h * hd : (h + 1) * hd] = (
            qkv[:, 2 * d + h * hd : 2 * d + (h + 1) * hd]
        )
    q_all = (qkv[:, :d].astype(jnp.float32) * scale).astype(qkv.dtype)
    st = jax.lax.dot_general(
        kbd_ref[:], q_all, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (R, S) : [h*S + j, i] = k_hj . q_hi
    rowj = jax.lax.broadcasted_iota(jnp.int32, (R, seq_pad), 0)
    st = jnp.where((rowj % seq_pad) < n, st, NEG_INF)
    s3 = st.reshape(num_heads, seq_pad, seq_pad)
    m = jnp.max(s3, axis=1, keepdims=True)
    e = jnp.exp(s3 - m).reshape(R, seq_pad).astype(qkv.dtype)
    lo = jax.lax.dot_general(
        e, ones_ref[:], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (S, d): normalizer broadcast across each head's hd cols
    ov = jax.lax.dot_general(
        e, vbd_ref[:], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (S, d)
    o_ref[0] = (ov / lo).astype(o_ref.dtype)


def _make_call(kernel, extra_scratch, num_heads, scale):
    def call(qkv, interpret=False):
        b, n, d3 = qkv.shape
        seq_pad = max(_cdiv(n, 128) * 128, 128)
        if seq_pad != n:
            qkv = jnp.pad(qkv, ((0, 0), (0, seq_pad - n), (0, 0)))
        lengths = jnp.full((1,), n, dtype=jnp.int32)
        d = d3 // 3
        scratch = extra_scratch(num_heads, seq_pad, d)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b,),
            in_specs=[pl.BlockSpec((1, seq_pad, d3), lambda i, lens: (i, 0, 0))],
            out_specs=pl.BlockSpec((1, seq_pad, d), lambda i, lens: (i, 0, 0)),
            scratch_shapes=scratch,
        )
        out = pl.pallas_call(
            functools.partial(
                kernel, num_heads=num_heads, seq_pad=seq_pad, scale=scale
            ),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((b, seq_pad, d), qkv.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            interpret=interpret,
        )(lengths, qkv)
        return out[:, :n, :]

    return call


def dots_call(qkv, num_heads, scale, interpret=False):
    return _make_call(_dots_kernel, lambda h, s, d: [], num_heads, scale)(
        qkv, interpret
    )


def widesm_call(qkv, num_heads, scale, interpret=False):
    return _make_call(
        _widesm_kernel,
        lambda h, s, d: [pltpu.VMEM((h * s, s), jnp.float32)],
        num_heads,
        scale,
    )(qkv, interpret)


def blockdiag_call(qkv, num_heads, scale, interpret=False):
    def scratch(h, s, d):
        return [
            pltpu.VMEM((h * s, d), jnp.bfloat16),
            pltpu.VMEM((h * s, d), jnp.bfloat16),
            pltpu.VMEM((h * s, d), jnp.bfloat16),
        ]

    return _make_call(_blockdiag_kernel, scratch, num_heads, scale)(
        qkv, interpret
    )


def make_widesm_attn(interpret=False):
    @functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
    def widesm_attn(qkv, num_heads, scale):
        return widesm_call(qkv, num_heads, scale, interpret)

    def fwd(qkv, num_heads, scale):
        return widesm_attn(qkv, num_heads, scale), (qkv,)

    def bwd(num_heads, scale, res, g):
        (qkv,) = res
        return (widesm_bwd_call(qkv, g, num_heads, scale, interpret),)

    widesm_attn.defvjp(fwd, bwd)
    return widesm_attn


CHAIN = 24


def bench(name, fn, qkv, iters=20):
    @jax.jit
    def chained(x):
        for _ in range(CHAIN):
            o = fn(x)
            x = jnp.concatenate([o, o, o], axis=-1)
        return x.mean()

    float(chained(qkv))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = chained(qkv)
    float(out)
    dt = (time.perf_counter() - t0) / iters / CHAIN * 1e3
    print(f"{name:10s} fwd {dt:7.3f} ms/op", flush=True)
    return dt


def bench_grad(name, fn, qkv, iters=20):
    @jax.jit
    def chained_grad(x):
        def loss(x):
            y = x
            for _ in range(CHAIN):
                o = fn(y)
                y = jnp.concatenate([o, o, o], axis=-1)
            return (y.astype(jnp.float32) ** 2).mean()

        return jax.grad(loss)(x).astype(jnp.float32).mean()

    float(chained_grad(qkv))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = chained_grad(qkv)
    float(out)
    dt = (time.perf_counter() - t0) / iters / CHAIN * 1e3
    print(f"{name:10s} fwd+bwd {dt:7.3f} ms/op", flush=True)
    return dt


def main():
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    interpret = "--interpret" in sys.argv
    b = int(argv[0]) if len(argv) > 0 else 128
    n = int(argv[1]) if len(argv) > 1 else 197
    h = int(argv[2]) if len(argv) > 2 else 6
    d = 64 * h
    scale = 64**-0.5
    qkv = jax.random.normal(jax.random.PRNGKey(0), (b, n, 3 * d), jnp.bfloat16)

    if interpret:
        # correctness (CPU interpret mode only — eager remote dispatch is
        # minutes-slow on the tunneled TPU backend)
        want = np.asarray(jax.jit(_mha_reference, static_argnums=(1, 2))(
            qkv, h, scale), np.float32)
        for name, fn in (
            ("widesm", widesm_call),
            ("blockdiag", blockdiag_call),
        ):
            got = np.asarray(fn(qkv, h, scale, interpret=True), np.float32)
            err = np.abs(got - want).max()
            print(f"{name:10s} max abs err vs ref: {err:.4g}")
            assert err < 0.02, (name, err)
        # grads: widesm custom_vjp vs autodiff through the XLA reference
        w = jax.random.normal(jax.random.PRNGKey(1), want.shape, jnp.bfloat16)
        ref_loss = lambda x: (_mha_reference(x, h, scale) * w).sum()
        attn = make_widesm_attn(interpret=True)
        new_loss = lambda x: (attn(x, h, scale) * w).sum()
        g_ref = np.asarray(jax.jit(jax.grad(ref_loss))(qkv), np.float32)
        g_new = np.asarray(jax.jit(jax.grad(new_loss))(qkv), np.float32)
        scale_g = np.abs(g_ref).max()
        err = np.abs(g_new - g_ref).max() / scale_g
        print(f"widesm-bwd rel err vs ref grad: {err:.4g} (|g|max {scale_g:.3g})")
        assert err < 0.03, err
        print("interpret mode: numerics only")
        return

    if "--bwdonly" in sys.argv:
        # time the bwd kernel body as a chained op: g := bwd(qkv, g-slice)
        from tpuwsi.ops.attention import _mha_qkv_backward

        def op(x):
            return _mha_qkv_backward(x, x[..., : x.shape[-1] // 3], h, scale,
                                     False)

        bench("cur-bwd", op, qkv)
        return
    if "--grad" in sys.argv:
        from tpuwsi.ops.attention import _mha_qkv

        attn = make_widesm_attn(interpret=False)
        bench_grad("cur", lambda x: _mha_qkv(x, h, scale, False), qkv)
        bench_grad("widesm", lambda x: attn(x, h, scale), qkv)
        bench_grad("ref-xla", lambda x: _mha_reference(x, h, scale), qkv)
        return
    bench("ref-xla", lambda x: _mha_reference(x, h, scale), qkv)
    bench("cur", lambda x: _mha_qkv_forward(x, h, scale, False), qkv)
    bench("dots", lambda x: dots_call(x, h, scale), qkv)
    bench("widesm", lambda x: widesm_call(x, h, scale), qkv)
    bench("blockdiag", lambda x: blockdiag_call(x, h, scale), qkv)


if __name__ == "__main__":
    main()
