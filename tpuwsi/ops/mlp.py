"""Fused transformer-MLP kernel for TPU (Pallas).

Motivation (profiled, BENCH.md round-2): the DINO SSL step is HBM-bound —
~37 GB/step of GEMM activation traffic at ~620 GB/s. The single largest
component is the MLP hidden activation h = gelu(x@W1): at mlp_ratio 4 it is
4× the residual stream, written to HBM by fc1, read back by fc2 in the
forward, and read twice more in the backward. This kernel keeps h entirely
in VMEM:

- forward: one pass over row tiles, x@W1 → gelu → @W2, h never leaves VMEM;
- backward: rematerializes h per row tile (flash-style) and accumulates
  dW1/dW2/db1/db2 in VMEM f32 scratch across the sequential row grid, so
  the only HBM traffic is x, dy, dx and the (tiny) weights.

Replaces the reference's two cuDNN GEMM launches + elementwise GELU per MLP
(timm ViT blocks, reference train.py:1045) with one fused TPU pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.custom_partitioning import custom_partitioning
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import NamedSharding, PartitionSpec as P


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


ROW_TILE = 512
# The backward holds ~4 (tile, F) f32 intermediates (u, h, dh, du + the gelu
# vjp residuals) plus the two f32 weight-grad accumulators — at tile 512 that
# exceeds the 16 MB scoped-VMEM limit (measured: 23.2 MB). 256 fits.
ROW_TILE_BWD = 256


_C = 0.7978845608028654  # sqrt(2/pi)
_A = 0.044715
_INV_SQRT2 = 0.7071067811865476
_INV_SQRT2PI = 0.3989422804014327


def _gelu(u, approx):
    # NOT jax.nn.gelu: its exact branch lowers through lax.erfc, which has
    # no Pallas TPU lowering (NotImplementedError at compile). lax.erf does.
    if approx:
        t = jnp.tanh(_C * (u + _A * u * u * u))
        return 0.5 * u * (1.0 + t)
    return u * 0.5 * (1.0 + jax.lax.erf(u * _INV_SQRT2))


def _gelu_and_grad(u, approx):
    """(gelu(u), gelu'(u)) computed manually — jax.vjp inside the kernel
    keeps enough (tile, F) f32 residuals to blow the 16 MB scoped-VMEM
    limit; this form needs only u and one temporary."""
    if approx:
        t = jnp.tanh(_C * (u + _A * u * u * u))
        g = 0.5 * u * (1.0 + t)
        dg = 0.5 * (1.0 + t) + 0.5 * u * (1.0 - t * t) * _C * (
            1.0 + 3.0 * _A * u * u
        )
        return g, dg
    phi = 0.5 * (1.0 + jax.lax.erf(u * _INV_SQRT2))
    pdf = jnp.exp(-0.5 * u * u) * _INV_SQRT2PI
    return u * phi, phi + u * pdf


def _bwd_vmem_ok(d: int, f: int) -> bool:
    """Whether the fused backward's VMEM working set fits: two f32 dW
    accumulators (d·f each) + ~5 (ROW_TILE_BWD, f) f32 tile intermediates +
    bf16 weights, against the ~30 MB limit we request (with margin)."""
    acc = 2 * d * f * 4
    tiles = 5 * ROW_TILE_BWD * f * 4
    weights = 2 * d * f * 2
    return acc + tiles + weights < int(2.6e7)


def _mlp_fwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, y_ref, *,
                    rows: int, tile: int, approx: bool):
    i = pl.program_id(0)
    rowi = i * tile + jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
    x = jnp.where(rowi < rows, x_ref[...], 0)  # OOB rows → 0 (ragged edge)
    u = jax.lax.dot_general(
        x, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[...].astype(jnp.float32)
    h = _gelu(u, approx).astype(x.dtype)
    y = jax.lax.dot_general(
        h, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[...].astype(jnp.float32)
    y_ref[...] = y.astype(y_ref.dtype)


def _mlp_bwd_kernel(x_ref, dy_ref, w1_ref, b1_ref, w2_ref, dx_ref,
                    dw1_ref, db1_ref, dw2_ref, db2_ref,
                    dw1_s, dw2_s, db1_s, db2_s, *,
                    rows: int, tile: int, approx: bool):
    i = pl.program_id(0)
    n = pl.num_programs(0)

    @pl.when(i == 0)
    def _init():
        dw1_s[:] = jnp.zeros_like(dw1_s)
        dw2_s[:] = jnp.zeros_like(dw2_s)
        db1_s[:] = jnp.zeros_like(db1_s)
        db2_s[:] = jnp.zeros_like(db2_s)

    rowi = i * tile + jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
    x = jnp.where(rowi < rows, x_ref[...], 0)
    dy = jnp.where(rowi < rows, dy_ref[...], 0).astype(jnp.float32)
    u = jax.lax.dot_general(
        x, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[...].astype(jnp.float32)
    h, dgelu = _gelu_and_grad(u, approx)
    h = h.astype(x.dtype)
    dy_c = dy.astype(x.dtype)
    # dh = dy @ W2ᵀ  (contract feature dims — no transpose materialized)
    dh = jax.lax.dot_general(
        dy_c, w2_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    du = dh * dgelu
    du_c = du.astype(x.dtype)
    # dx = du @ W1ᵀ
    dx = jax.lax.dot_general(
        du_c, w1_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dx_ref[...] = dx.astype(dx_ref.dtype)
    # weight/bias gradients accumulate in VMEM across the sequential grid
    dw1_s[:] += jax.lax.dot_general(
        x, du_c, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dw2_s[:] += jax.lax.dot_general(
        h, dy_c, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    db1_s[:] += jnp.sum(du, axis=0, keepdims=True)
    db2_s[:] += jnp.sum(dy, axis=0, keepdims=True)

    @pl.when(i == n - 1)
    def _fin():
        dw1_ref[...] = dw1_s[:].astype(dw1_ref.dtype)
        dw2_ref[...] = dw2_s[:].astype(dw2_ref.dtype)
        db1_ref[...] = db1_s[:].astype(db1_ref.dtype)
        db2_ref[...] = db2_s[:].astype(db2_ref.dtype)


def _mlp_forward(x2, w1, b1, w2, b2, approx, interpret):
    rows, d = x2.shape
    f = w1.shape[1]
    tile = min(ROW_TILE, max(_cdiv(rows, 8) * 8, 8))
    grid = (_cdiv(rows, tile),)
    return pl.pallas_call(
        functools.partial(_mlp_fwd_kernel, rows=rows, tile=tile,
                          approx=approx),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, d), lambda i: (i, 0)),
            pl.BlockSpec((d, f), lambda i: (0, 0)),
            pl.BlockSpec((1, f), lambda i: (0, 0)),
            pl.BlockSpec((f, d), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tile, d), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, d), x2.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),  # no cross-tile state in fwd
        ),
        interpret=interpret,
    )(x2, w1, b1.reshape(1, f), w2, b2.reshape(1, d))


def _mlp_backward(x2, dy2, w1, b1, w2, approx, interpret):
    rows, d = x2.shape
    f = w1.shape[1]
    tile = min(ROW_TILE_BWD, max(_cdiv(rows, 8) * 8, 8))
    grid = (_cdiv(rows, tile),)
    dx, dw1, db1, dw2, db2 = pl.pallas_call(
        functools.partial(_mlp_bwd_kernel, rows=rows, tile=tile,
                          approx=approx),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, d), lambda i: (i, 0)),
            pl.BlockSpec((tile, d), lambda i: (i, 0)),
            pl.BlockSpec((d, f), lambda i: (0, 0)),
            pl.BlockSpec((1, f), lambda i: (0, 0)),
            pl.BlockSpec((f, d), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((tile, d), lambda i: (i, 0)),
            pl.BlockSpec((d, f), lambda i: (0, 0)),
            pl.BlockSpec((1, f), lambda i: (0, 0)),
            pl.BlockSpec((f, d), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, d), x2.dtype),
            jax.ShapeDtypeStruct((d, f), jnp.float32),
            jax.ShapeDtypeStruct((1, f), jnp.float32),
            jax.ShapeDtypeStruct((f, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((d, f), jnp.float32),
            pltpu.VMEM((f, d), jnp.float32),
            pltpu.VMEM((1, f), jnp.float32),
            pltpu.VMEM((1, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # tile intermediates + the two f32 weight-grad accumulators sit
            # at ~16.3 MB — just over Mosaic's 16 MB default scoped limit
            # (the chip has far more physical VMEM).
            vmem_limit_bytes=int(3e7),
        ),
        interpret=interpret,
    )(x2, dy2, w1, b1.reshape(1, f), w2)
    return dx, dw1, db1.reshape(f), dw2, db2.reshape(d)


def _row_sharded_axes(mesh, arg_shape):
    """Mesh axis names the leading (row/batch) dim of `arg_shape` is sharded
    over — the axes weight-gradient partials must be psummed across."""
    spec = arg_shape.sharding.spec
    if not spec or spec[0] is None:
        return ()
    s = spec[0]
    return tuple(s) if isinstance(s, tuple) else (s,)


@functools.partial(custom_partitioning, static_argnums=(5, 6))
def _mlp_forward_p(x2, w1, b1, w2, b2, approx, interpret):
    return _mlp_forward(x2, w1, b1, w2, b2, approx, interpret)


def _mlp_fwd_infer(approx, interpret, mesh, arg_shapes, result_shape):
    spec = arg_shapes[0].sharding.spec
    lead = spec[0] if spec else None
    return NamedSharding(mesh, P(lead, None))


def _mlp_fwd_partition(approx, interpret, mesh, arg_shapes, result_shape):
    x_sh = _mlp_fwd_infer(approx, interpret, mesh, arg_shapes, result_shape)
    rep = NamedSharding(mesh, P(None, None))
    rep1 = NamedSharding(mesh, P(None))

    def lower(x2, w1, b1, w2, b2):
        return _mlp_forward(x2, w1, b1, w2, b2, approx, interpret)

    return mesh, lower, x_sh, (x_sh, rep, rep1, rep, rep1)


_mlp_forward_p.def_partition(
    partition=_mlp_fwd_partition,
    infer_sharding_from_operands=_mlp_fwd_infer,
    sharding_rule="r d, d f, f, f e, e -> r e",
    need_replication_factors=("d", "f", "e"),
)


@functools.partial(custom_partitioning, static_argnums=(5, 6))
def _mlp_backward_p(x2, dy2, w1, b1, w2, approx, interpret):
    return _mlp_backward(x2, dy2, w1, b1, w2, approx, interpret)


def _mlp_bwd_infer(approx, interpret, mesh, arg_shapes, result_shape):
    spec = arg_shapes[0].sharding.spec
    lead = spec[0] if spec else None
    x_sh = NamedSharding(mesh, P(lead, None))
    rep = NamedSharding(mesh, P(None, None))
    rep1 = NamedSharding(mesh, P(None))
    return (x_sh, rep, rep1, rep, rep1)


def _mlp_bwd_partition(approx, interpret, mesh, arg_shapes, result_shape):
    outs = _mlp_bwd_infer(approx, interpret, mesh, arg_shapes, result_shape)
    x_sh = outs[0]
    rep = NamedSharding(mesh, P(None, None))
    rep1 = NamedSharding(mesh, P(None))
    psum_axes = _row_sharded_axes(mesh, arg_shapes[0])

    def lower(x2, dy2, w1, b1, w2):
        dx, dw1, db1, dw2, db2 = _mlp_backward(
            x2, dy2, w1, b1, w2, approx, interpret
        )
        if psum_axes:
            # rows are sharded: weight/bias grads are per-shard partial sums
            dw1, db1, dw2, db2 = (
                jax.lax.psum(t, psum_axes) for t in (dw1, db1, dw2, db2)
            )
        return dx, dw1, db1, dw2, db2

    return mesh, lower, outs, (x_sh, x_sh, rep, rep1, rep)


_mlp_backward_p.def_partition(
    partition=_mlp_bwd_partition,
    infer_sharding_from_operands=_mlp_bwd_infer,
    sharding_rule="r d, r e, d f, f, f e -> r d, d f, f, f e, e",
    # factor order = first appearance in the rule (r, d, e, f)
    need_replication_factors=("d", "e", "f"),
)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _fused_mlp(x2, w1, b1, w2, b2, approx, interpret):
    return _mlp_forward_p(x2, w1, b1, w2, b2, approx, interpret)


def _fused_mlp_fwd(x2, w1, b1, w2, b2, approx, interpret):
    y = _mlp_forward_p(x2, w1, b1, w2, b2, approx, interpret)
    return y, (x2, w1, b1, w2)


def _fused_mlp_bwd(approx, interpret, res, dy):
    x2, w1, b1, w2 = res
    dx, dw1, db1, dw2, db2 = _mlp_backward_p(
        x2, dy, w1, b1, w2, approx, interpret
    )
    return (
        dx,
        dw1.astype(w1.dtype),
        db1.astype(b1.dtype),
        dw2.astype(w2.dtype),
        db2.astype(w2.dtype),  # b2 isn't a residual; all operands share dtype
    )


_fused_mlp.defvjp(_fused_mlp_fwd, _fused_mlp_bwd)


def fused_mlp(
    x: jax.Array,
    w1: jax.Array,
    b1: jax.Array,
    w2: jax.Array,
    b2: jax.Array,
    *,
    approx: bool = False,
    interpret: bool | None = None,
) -> jax.Array:
    """y = gelu(x @ w1 + b1) @ w2 + b2 with the hidden activation resident in
    VMEM (never written to HBM) in both directions.

    x: (..., D); w1: (D, F); w2: (F, D_out). Dispatches to the Pallas kernel
    on TPU (or in interpret mode); XLA reference elsewhere. Multi-chip: row
    (batch) axis shardable via custom_partitioning; weight grads psum over
    the row-sharded mesh axes.

    Exact (erf) GELU falls back to XLA on real TPUs: this image's Mosaic has
    no erf/erfc lowering (NotImplementedError at compile) — only the
    tanh-approx path runs in-kernel. Interpret mode supports both.
    Large widths also fall back: the backward's two f32 weight-grad
    accumulators must fit VMEM alongside the row-tile intermediates (ViT-S
    fits; ViT-B's 768×3072 accumulators alone are ~19 MB).
    """
    use_pallas = (
        jax.default_backend() == "tpu" and approx
        and _bwd_vmem_ok(w1.shape[0], w1.shape[1])
    ) or interpret
    dt = x.dtype
    if not use_pallas:
        u = (x @ w1.astype(dt)) + b1.astype(dt)
        h = jax.nn.gelu(u, approximate=approx)
        return (h @ w2.astype(dt)) + b2.astype(dt)
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    y = _fused_mlp(
        x2, w1.astype(dt), b1.astype(dt), w2.astype(dt), b2.astype(dt),
        bool(approx), bool(interpret),
    )
    return y.reshape(*lead, y.shape[-1])


# ---------------------------------------------------------------------------
# Hybrid MLP: XLA forward, Pallas backward.
#
# Round-3 per-fusion MFU accounting (BENCH.md): XLA's FORWARD mega-fusions
# (fc1+gelu+fc2+residual+LN-stats) run at 85-95% MFU — better than the
# fused_mlp forward kernel in-step — but its BACKWARD dgrad+wgrad+dbias
# multi-output fusions sit at 56-79%, an emitter property (splitting them
# measured worse: the shared dy re-read costs more HBM than the recovered
# MXU). This op takes the best half of each: the forward is plain traced
# XLA math (custom_vjp does not introduce a call boundary, so the GEMMs
# keep fusing into the forward mega-chains AND the u/h intermediates are
# no longer saved as autodiff residuals), while the VJP routes through the
# existing _mlp_backward_p kernel (remats h per row tile, accumulates
# dW1/db1/dW2/db2 in VMEM f32 across the sequential row grid).
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _hybrid_mlp(x, w1, b1, w2, b2, approx, interpret):
    # Rank-preserving XLA forward — rank-3 dots lower through the conv
    # emitter, which is what lets fc1+gelu+fc2 fuse into one mega-fusion
    # (BENCH.md round-3 "rank-2 flattening" negative result).
    u = x @ w1 + b1
    h = jax.nn.gelu(u, approximate=approx)
    return h @ w2 + b2


def _hybrid_mlp_fwd(x, w1, b1, w2, b2, approx, interpret):
    return _hybrid_mlp(x, w1, b1, w2, b2, approx, interpret), (x, w1, b1, w2)


def _hybrid_mlp_bwd(approx, interpret, res, dy):
    x, w1, b1, w2 = res
    d = x.shape[-1]
    dx, dw1, db1, dw2, db2 = _mlp_backward_p(
        x.reshape(-1, d), dy.astype(x.dtype).reshape(-1, w2.shape[-1]),
        w1, b1, w2, approx, interpret,
    )
    return (
        dx.reshape(x.shape),
        dw1.astype(w1.dtype),
        db1.astype(b1.dtype),
        dw2.astype(w2.dtype),
        db2.astype(w2.dtype),
    )


_hybrid_mlp.defvjp(_hybrid_mlp_fwd, _hybrid_mlp_bwd)


def hybrid_mlp(
    x: jax.Array,
    w1: jax.Array,
    b1: jax.Array,
    w2: jax.Array,
    b2: jax.Array,
    *,
    approx: bool = False,
    interpret: bool | None = None,
) -> jax.Array:
    """gelu(x @ w1 + b1) @ w2 + b2 with an XLA forward (keeps the forward
    mega-fusions, saves the u/h residuals) and the fused Pallas backward
    (one dy read per row tile → dx + all four weight/bias grads).

    Same dispatch gates as fused_mlp: TPU + tanh-approx GELU (Mosaic has no
    erf lowering in this image) + the f32 dW accumulators must fit VMEM;
    plain XLA everywhere else.
    """
    dt = x.dtype
    use_pallas = (
        jax.default_backend() == "tpu" and approx
        and _bwd_vmem_ok(w1.shape[0], w1.shape[1])
    ) or interpret
    if not use_pallas:
        u = (x @ w1.astype(dt)) + b1.astype(dt)
        h = jax.nn.gelu(u, approximate=approx)
        return (h @ w2.astype(dt)) + b2.astype(dt)
    return _hybrid_mlp(
        x, w1.astype(dt), b1.astype(dt), w2.astype(dt), b2.astype(dt),
        bool(approx), bool(interpret),
    )


# ---------------------------------------------------------------------------
# Fused pre-norm MLP block: y = x + gelu(LN(x) @ W1 + b1) @ W2 + b2
#
# Beyond fused_mlp this also folds the LayerNorm and the residual add into
# the kernel — profiling showed every op boundary in the step costs real
# time (copies/reshapes at custom-call edges, per-op DMA prologues), so the
# whole pre-norm MLP sub-block runs as ONE op: LN's f32 intermediate, the
# MLP hidden state, and the residual read-modify-write never touch HBM.
# ---------------------------------------------------------------------------


def _ln_fwd(xf, g, be, eps):
    """flax nn.LayerNorm semantics (fast variance, f32 compute)."""
    mu = jnp.mean(xf, axis=1, keepdims=True)
    var = jnp.mean(xf * xf, axis=1, keepdims=True) - mu * mu
    inv = jax.lax.rsqrt(jnp.maximum(var, 0.0) + eps)
    uhat = (xf - mu) * inv
    return uhat * g + be, uhat, inv


def _mlp_block_fwd_kernel(x_ref, g_ref, be_ref, w1_ref, b1_ref, w2_ref,
                          b2_ref, y_ref, *, rows: int, tile: int,
                          approx: bool, eps: float):
    i = pl.program_id(0)
    rowi = i * tile + jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
    x = jnp.where(rowi < rows, x_ref[...], 0)
    xf = x.astype(jnp.float32)
    ln, _, _ = _ln_fwd(xf, g_ref[...].astype(jnp.float32),
                       be_ref[...].astype(jnp.float32), eps)
    lnc = ln.astype(x.dtype)  # matches the unfused f32→bf16 cast before fc1
    u = jax.lax.dot_general(
        lnc, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[...].astype(jnp.float32)
    h = _gelu(u, approx).astype(x.dtype)
    y = jax.lax.dot_general(
        h, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[...].astype(jnp.float32)
    # residual add in the stream dtype (unfused: bf16 + bf16)
    y_ref[...] = x + y.astype(y_ref.dtype)


def _mlp_block_bwd_kernel(x_ref, dy_ref, g_ref, be_ref, w1_ref, b1_ref,
                          w2_ref, dx_ref,
                          dg_ref, dbe_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
                          dw1_s, dw2_s, db1_s, db2_s, dg_s, dbe_s, *,
                          rows: int, tile: int, approx: bool, eps: float):
    i = pl.program_id(0)
    n = pl.num_programs(0)

    @pl.when(i == 0)
    def _init():
        dw1_s[:] = jnp.zeros_like(dw1_s)
        dw2_s[:] = jnp.zeros_like(dw2_s)
        db1_s[:] = jnp.zeros_like(db1_s)
        db2_s[:] = jnp.zeros_like(db2_s)
        dg_s[:] = jnp.zeros_like(dg_s)
        dbe_s[:] = jnp.zeros_like(dbe_s)

    rowi = i * tile + jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
    x = jnp.where(rowi < rows, x_ref[...], 0)
    dy = jnp.where(rowi < rows, dy_ref[...], 0).astype(jnp.float32)
    xf = x.astype(jnp.float32)
    gam = g_ref[...].astype(jnp.float32)
    ln, uhat, inv = _ln_fwd(xf, gam, be_ref[...].astype(jnp.float32), eps)
    lnc = ln.astype(x.dtype)
    u = jax.lax.dot_general(
        lnc, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[...].astype(jnp.float32)
    h, dgelu = _gelu_and_grad(u, approx)
    h = h.astype(x.dtype)
    dy_c = dy.astype(x.dtype)
    dh = jax.lax.dot_general(
        dy_c, w2_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    du = dh * dgelu
    du_c = du.astype(x.dtype)
    dln = jax.lax.dot_general(
        du_c, w1_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # grad at LN output, f32
    # LayerNorm backward (per row): dxhat = dln∘γ;
    # dx_ln = inv·(dxhat − mean(dxhat) − uhat·mean(dxhat∘uhat))
    dxhat = dln * gam
    m1 = jnp.mean(dxhat, axis=1, keepdims=True)
    m2 = jnp.mean(dxhat * uhat, axis=1, keepdims=True)
    dx_ln = inv * (dxhat - m1 - uhat * m2)
    dx_ref[...] = (dy + dx_ln).astype(dx_ref.dtype)  # + residual path

    dw1_s[:] += jax.lax.dot_general(
        lnc, du_c, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dw2_s[:] += jax.lax.dot_general(
        h, dy_c, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    db1_s[:] += jnp.sum(du, axis=0, keepdims=True)
    db2_s[:] += jnp.sum(dy, axis=0, keepdims=True)
    dg_s[:] += jnp.sum(dln * uhat, axis=0, keepdims=True)
    dbe_s[:] += jnp.sum(dln, axis=0, keepdims=True)

    @pl.when(i == n - 1)
    def _fin():
        dw1_ref[...] = dw1_s[:].astype(dw1_ref.dtype)
        dw2_ref[...] = dw2_s[:].astype(dw2_ref.dtype)
        db1_ref[...] = db1_s[:].astype(db1_ref.dtype)
        db2_ref[...] = db2_s[:].astype(db2_ref.dtype)
        dg_ref[...] = dg_s[:].astype(dg_ref.dtype)
        dbe_ref[...] = dbe_s[:].astype(dbe_ref.dtype)


def _mlp_block_forward(x2, g, be, w1, b1, w2, b2, approx, eps, interpret):
    rows, d = x2.shape
    f = w1.shape[1]
    tile = min(ROW_TILE, max(_cdiv(rows, 8) * 8, 8))
    grid = (_cdiv(rows, tile),)
    return pl.pallas_call(
        functools.partial(_mlp_block_fwd_kernel, rows=rows, tile=tile,
                          approx=approx, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, d), lambda i: (i, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((d, f), lambda i: (0, 0)),
            pl.BlockSpec((1, f), lambda i: (0, 0)),
            pl.BlockSpec((f, d), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tile, d), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, d), x2.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(x2, g.reshape(1, d), be.reshape(1, d), w1, b1.reshape(1, f), w2,
      b2.reshape(1, d))


def _mlp_block_backward(x2, dy2, g, be, w1, b1, w2, approx, eps, interpret):
    rows, d = x2.shape
    f = w1.shape[1]
    tile = min(ROW_TILE_BWD, max(_cdiv(rows, 8) * 8, 8))
    grid = (_cdiv(rows, tile),)
    outs = pl.pallas_call(
        functools.partial(_mlp_block_bwd_kernel, rows=rows, tile=tile,
                          approx=approx, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, d), lambda i: (i, 0)),
            pl.BlockSpec((tile, d), lambda i: (i, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((d, f), lambda i: (0, 0)),
            pl.BlockSpec((1, f), lambda i: (0, 0)),
            pl.BlockSpec((f, d), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((tile, d), lambda i: (i, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((d, f), lambda i: (0, 0)),
            pl.BlockSpec((1, f), lambda i: (0, 0)),
            pl.BlockSpec((f, d), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, d), x2.dtype),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((d, f), jnp.float32),
            jax.ShapeDtypeStruct((1, f), jnp.float32),
            jax.ShapeDtypeStruct((f, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((d, f), jnp.float32),
            pltpu.VMEM((f, d), jnp.float32),
            pltpu.VMEM((1, f), jnp.float32),
            pltpu.VMEM((1, d), jnp.float32),
            pltpu.VMEM((1, d), jnp.float32),
            pltpu.VMEM((1, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=int(3e7),
        ),
        interpret=interpret,
    )(x2, dy2, g.reshape(1, d), be.reshape(1, d), w1, b1.reshape(1, f), w2)
    dx, dg, dbe, dw1, db1, dw2, db2 = outs
    return (dx, dg.reshape(d), dbe.reshape(d), dw1, db1.reshape(f), dw2,
            db2.reshape(d))


@functools.partial(custom_partitioning, static_argnums=(7, 8, 9))
def _mlp_block_forward_p(x2, g, be, w1, b1, w2, b2, approx, eps, interpret):
    return _mlp_block_forward(x2, g, be, w1, b1, w2, b2, approx, eps,
                              interpret)


def _blk_fwd_infer(approx, eps, interpret, mesh, arg_shapes, result_shape):
    spec = arg_shapes[0].sharding.spec
    lead = spec[0] if spec else None
    return NamedSharding(mesh, P(lead, None))


def _blk_fwd_partition(approx, eps, interpret, mesh, arg_shapes,
                       result_shape):
    x_sh = _blk_fwd_infer(approx, eps, interpret, mesh, arg_shapes,
                          result_shape)
    rep = NamedSharding(mesh, P(None, None))
    rep1 = NamedSharding(mesh, P(None))

    def lower(x2, g, be, w1, b1, w2, b2):
        return _mlp_block_forward(x2, g, be, w1, b1, w2, b2, approx, eps,
                                  interpret)

    return mesh, lower, x_sh, (x_sh, rep1, rep1, rep, rep1, rep, rep1)


_mlp_block_forward_p.def_partition(
    partition=_blk_fwd_partition,
    infer_sharding_from_operands=_blk_fwd_infer,
    sharding_rule="r d, d, d, d f, f, f e, e -> r e",
    need_replication_factors=("d", "f", "e"),
)


@functools.partial(custom_partitioning, static_argnums=(7, 8, 9))
def _mlp_block_backward_p(x2, dy2, g, be, w1, b1, w2, approx, eps, interpret):
    return _mlp_block_backward(x2, dy2, g, be, w1, b1, w2, approx, eps,
                               interpret)


def _blk_bwd_infer(approx, eps, interpret, mesh, arg_shapes, result_shape):
    spec = arg_shapes[0].sharding.spec
    lead = spec[0] if spec else None
    x_sh = NamedSharding(mesh, P(lead, None))
    rep = NamedSharding(mesh, P(None, None))
    rep1 = NamedSharding(mesh, P(None))
    return (x_sh, rep1, rep1, rep, rep1, rep, rep1)


def _blk_bwd_partition(approx, eps, interpret, mesh, arg_shapes,
                       result_shape):
    outs = _blk_bwd_infer(approx, eps, interpret, mesh, arg_shapes,
                          result_shape)
    x_sh = outs[0]
    rep = NamedSharding(mesh, P(None, None))
    rep1 = NamedSharding(mesh, P(None))
    psum_axes = _row_sharded_axes(mesh, arg_shapes[0])

    def lower(x2, dy2, g, be, w1, b1, w2):
        res = _mlp_block_backward(x2, dy2, g, be, w1, b1, w2, approx, eps,
                                  interpret)
        if psum_axes:
            dx = res[0]
            rest = tuple(jax.lax.psum(t, psum_axes) for t in res[1:])
            return (dx,) + rest
        return res

    return mesh, lower, outs, (x_sh, x_sh, rep1, rep1, rep, rep1, rep)


_mlp_block_backward_p.def_partition(
    partition=_blk_bwd_partition,
    infer_sharding_from_operands=_blk_bwd_infer,
    sharding_rule=(
        "r d, r e, d, d, d f, f, f e -> r d, d, d, d f, f, f e, e"
    ),
    need_replication_factors=("d", "e", "f"),
)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _fused_mlp_block(x2, g, be, w1, b1, w2, b2, approx, eps, interpret):
    return _mlp_block_forward_p(x2, g, be, w1, b1, w2, b2, approx, eps,
                                interpret)


def _fused_mlp_block_fwd(x2, g, be, w1, b1, w2, b2, approx, eps, interpret):
    y = _mlp_block_forward_p(x2, g, be, w1, b1, w2, b2, approx, eps,
                             interpret)
    return y, (x2, g, be, w1, b1, w2)


def _fused_mlp_block_bwd(approx, eps, interpret, res, dy):
    x2, g, be, w1, b1, w2 = res
    dx, dg, dbe, dw1, db1, dw2, db2 = _mlp_block_backward_p(
        x2, dy, g, be, w1, b1, w2, approx, eps, interpret
    )
    return (
        dx,
        dg.astype(g.dtype),
        dbe.astype(be.dtype),
        dw1.astype(w1.dtype),
        db1.astype(b1.dtype),
        dw2.astype(w2.dtype),
        db2.astype(w2.dtype),
    )


_fused_mlp_block.defvjp(_fused_mlp_block_fwd, _fused_mlp_block_bwd)


def fused_mlp_block(
    x: jax.Array,
    ln_scale: jax.Array,
    ln_bias: jax.Array,
    w1: jax.Array,
    b1: jax.Array,
    w2: jax.Array,
    b2: jax.Array,
    *,
    approx: bool = False,
    eps: float = 1e-6,
    interpret: bool | None = None,
) -> jax.Array:
    """Pre-norm MLP sub-block y = x + gelu(LN(x)@W1+b1)@W2+b2 as ONE TPU op.

    x: (..., D) residual stream. LN runs in f32 (flax fast-variance
    semantics) with the same f32→stream-dtype cast before fc1 as the
    unfused module path; the residual add happens in the stream dtype.
    Exact (erf) GELU falls back to XLA on real TPUs (no Mosaic erf lowering
    in this image); the tanh-approx path runs in-kernel. Large widths fall
    back too (see fused_mlp).
    """
    use_pallas = (
        jax.default_backend() == "tpu" and approx
        and _bwd_vmem_ok(w1.shape[0], w1.shape[1])
    ) or interpret
    dt = x.dtype
    if not use_pallas:
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
        inv = jax.lax.rsqrt(jnp.maximum(var, 0.0) + eps)
        ln = ((xf - mu) * inv) * ln_scale + ln_bias
        h = jax.nn.gelu(ln.astype(dt) @ w1.astype(dt) + b1.astype(dt),
                        approximate=approx)
        return x + (h @ w2.astype(dt) + b2.astype(dt)).astype(dt)
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    y = _fused_mlp_block(
        x2, ln_scale.astype(jnp.float32), ln_bias.astype(jnp.float32),
        w1.astype(dt), b1.astype(dt), w2.astype(dt), b2.astype(dt),
        bool(approx), float(eps), bool(interpret),
    )
    return y.reshape(*lead, y.shape[-1])


# ---------------------------------------------------------------------------
# Row-tiled LN+GEMM and GEMM+residual ops.
#
# The attention-block megakernel lost to XLA because its GEMMs were
# per-batch-element (M = seq_pad); these two ops keep the MLP-block recipe —
# row tiles sweeping the FLATTENED batch at full GEMM efficiency — and fuse
# only the cheap neighbours (LN / residual add) into the GEMM, removing two
# op boundaries + the f32 LN intermediate per attention site.
#   fused_ln_gemm:       y = LN(x) @ W + b        (pre-norm qkv projection)
#   fused_gemm_residual: y = res + a @ W + b      (output projection)
# ---------------------------------------------------------------------------


def _ln_gemm_fwd_kernel(x_ref, g_ref, be_ref, w_ref, b_ref, y_ref, *,
                        rows: int, tile: int, eps: float):
    i = pl.program_id(0)
    rowi = i * tile + jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
    x = jnp.where(rowi < rows, x_ref[...], 0)
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=1, keepdims=True)
    var = jnp.mean(xf * xf, axis=1, keepdims=True) - mu * mu
    inv = jax.lax.rsqrt(jnp.maximum(var, 0.0) + eps)
    ln = ((xf - mu) * inv) * g_ref[...].astype(jnp.float32) + \
        be_ref[...].astype(jnp.float32)
    y = jax.lax.dot_general(
        ln.astype(x.dtype), w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b_ref[...].astype(jnp.float32)
    y_ref[...] = y.astype(y_ref.dtype)


def _ln_gemm_bwd_kernel(x_ref, dy_ref, g_ref, be_ref, w_ref, dx_ref,
                        dg_ref, dbe_ref, dw_ref, db_ref,
                        dw_s, db_s, dg_s, dbe_s, *,
                        rows: int, tile: int, eps: float):
    i = pl.program_id(0)
    n = pl.num_programs(0)

    @pl.when(i == 0)
    def _init():
        dw_s[:] = jnp.zeros_like(dw_s)
        db_s[:] = jnp.zeros_like(db_s)
        dg_s[:] = jnp.zeros_like(dg_s)
        dbe_s[:] = jnp.zeros_like(dbe_s)

    rowi = i * tile + jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
    x = jnp.where(rowi < rows, x_ref[...], 0)
    dy = jnp.where(rowi < rows, dy_ref[...], 0)
    xf = x.astype(jnp.float32)
    gam = g_ref[...].astype(jnp.float32)
    mu = jnp.mean(xf, axis=1, keepdims=True)
    var = jnp.mean(xf * xf, axis=1, keepdims=True) - mu * mu
    inv = jax.lax.rsqrt(jnp.maximum(var, 0.0) + eps)
    uhat = (xf - mu) * inv
    ln = uhat * gam + be_ref[...].astype(jnp.float32)
    lnc = ln.astype(x.dtype)
    dy_c = dy
    dw_s[:] += jax.lax.dot_general(
        lnc, dy_c, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db_s[:] += jnp.sum(dy.astype(jnp.float32), axis=0, keepdims=True)
    dln = jax.lax.dot_general(
        dy_c, w_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dxhat = dln * gam
    m1 = jnp.mean(dxhat, axis=1, keepdims=True)
    m2 = jnp.mean(dxhat * uhat, axis=1, keepdims=True)
    dx_ref[...] = (inv * (dxhat - m1 - uhat * m2)).astype(dx_ref.dtype)
    dg_s[:] += jnp.sum(dln * uhat, axis=0, keepdims=True)
    dbe_s[:] += jnp.sum(dln, axis=0, keepdims=True)

    @pl.when(i == n - 1)
    def _fin():
        dw_ref[...] = dw_s[:].astype(dw_ref.dtype)
        db_ref[...] = db_s[:].astype(db_ref.dtype)
        dg_ref[...] = dg_s[:].astype(dg_ref.dtype)
        dbe_ref[...] = dbe_s[:].astype(dbe_ref.dtype)


def _ln_gemm_forward(x2, g, be, w, b, eps, interpret):
    rows, d = x2.shape
    f = w.shape[1]
    tile = min(ROW_TILE, max(_cdiv(rows, 8) * 8, 8))
    return pl.pallas_call(
        functools.partial(_ln_gemm_fwd_kernel, rows=rows, tile=tile, eps=eps),
        grid=(_cdiv(rows, tile),),
        in_specs=[
            pl.BlockSpec((tile, d), lambda i: (i, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((d, f), lambda i: (0, 0)),
            pl.BlockSpec((1, f), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tile, f), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, f), x2.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=int(3e7),
        ),
        interpret=interpret,
    )(x2, g.reshape(1, d), be.reshape(1, d), w, b.reshape(1, f))


def _ln_gemm_backward(x2, dy2, g, be, w, eps, interpret):
    rows, d = x2.shape
    f = w.shape[1]
    tile = min(ROW_TILE_BWD, max(_cdiv(rows, 8) * 8, 8))
    outs = pl.pallas_call(
        functools.partial(_ln_gemm_bwd_kernel, rows=rows, tile=tile, eps=eps),
        grid=(_cdiv(rows, tile),),
        in_specs=[
            pl.BlockSpec((tile, d), lambda i: (i, 0)),
            pl.BlockSpec((tile, f), lambda i: (i, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((d, f), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((tile, d), lambda i: (i, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((d, f), lambda i: (0, 0)),
            pl.BlockSpec((1, f), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, d), x2.dtype),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((d, f), jnp.float32),
            jax.ShapeDtypeStruct((1, f), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((d, f), jnp.float32),
            pltpu.VMEM((1, f), jnp.float32),
            pltpu.VMEM((1, d), jnp.float32),
            pltpu.VMEM((1, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=int(3e7),
        ),
        interpret=interpret,
    )(x2, dy2, g.reshape(1, d), be.reshape(1, d), w)
    dx, dg, dbe, dw, db = outs
    return dx, dg.reshape(d), dbe.reshape(d), dw, db.reshape(f)


@functools.partial(custom_partitioning, static_argnums=(5, 6))
def _ln_gemm_forward_p(x2, g, be, w, b, eps, interpret):
    return _ln_gemm_forward(x2, g, be, w, b, eps, interpret)


def _lg_fwd_infer(eps, interpret, mesh, arg_shapes, result_shape):
    spec = arg_shapes[0].sharding.spec
    lead = spec[0] if spec else None
    return NamedSharding(mesh, P(lead, None))


def _lg_fwd_partition(eps, interpret, mesh, arg_shapes, result_shape):
    x_sh = _lg_fwd_infer(eps, interpret, mesh, arg_shapes, result_shape)
    rep = NamedSharding(mesh, P(None, None))
    rep1 = NamedSharding(mesh, P(None))

    def lower(x2, g, be, w, b):
        return _ln_gemm_forward(x2, g, be, w, b, eps, interpret)

    return mesh, lower, x_sh, (x_sh, rep1, rep1, rep, rep1)


_ln_gemm_forward_p.def_partition(
    partition=_lg_fwd_partition,
    infer_sharding_from_operands=_lg_fwd_infer,
    sharding_rule="r d, d, d, d f, f -> r f",
    need_replication_factors=("d", "f"),
)


@functools.partial(custom_partitioning, static_argnums=(5, 6))
def _ln_gemm_backward_p(x2, dy2, g, be, w, eps, interpret):
    return _ln_gemm_backward(x2, dy2, g, be, w, eps, interpret)


def _lg_bwd_infer(eps, interpret, mesh, arg_shapes, result_shape):
    spec = arg_shapes[0].sharding.spec
    lead = spec[0] if spec else None
    x_sh = NamedSharding(mesh, P(lead, None))
    rep = NamedSharding(mesh, P(None, None))
    rep1 = NamedSharding(mesh, P(None))
    return (x_sh, rep1, rep1, rep, rep1)


def _lg_bwd_partition(eps, interpret, mesh, arg_shapes, result_shape):
    outs = _lg_bwd_infer(eps, interpret, mesh, arg_shapes, result_shape)
    x_sh = outs[0]
    rep = NamedSharding(mesh, P(None, None))
    rep1 = NamedSharding(mesh, P(None))
    psum_axes = _row_sharded_axes(mesh, arg_shapes[0])

    def lower(x2, dy2, g, be, w):
        res = _ln_gemm_backward(x2, dy2, g, be, w, eps, interpret)
        if psum_axes:
            dx = res[0]
            rest = tuple(jax.lax.psum(t, psum_axes) for t in res[1:])
            return (dx,) + rest
        return res

    return mesh, lower, outs, (x_sh, x_sh, rep1, rep1, rep)


_ln_gemm_backward_p.def_partition(
    partition=_lg_bwd_partition,
    infer_sharding_from_operands=_lg_bwd_infer,
    sharding_rule="r d, r f, d, d, d f -> r d, d, d, d f, f",
    need_replication_factors=("d", "f"),
)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _fused_ln_gemm(x2, g, be, w, b, eps, interpret):
    return _ln_gemm_forward_p(x2, g, be, w, b, eps, interpret)


def _fused_ln_gemm_fwd(x2, g, be, w, b, eps, interpret):
    return _ln_gemm_forward_p(x2, g, be, w, b, eps, interpret), (x2, g, be, w)


def _fused_ln_gemm_bwd(eps, interpret, res, dy):
    x2, g, be, w = res
    dx, dg, dbe, dw, db = _ln_gemm_backward_p(x2, dy, g, be, w, eps,
                                              interpret)
    return (dx, dg.astype(g.dtype), dbe.astype(be.dtype),
            dw.astype(w.dtype), db.astype(w.dtype))


_fused_ln_gemm.defvjp(_fused_ln_gemm_fwd, _fused_ln_gemm_bwd)


def fused_ln_gemm(x, ln_scale, ln_bias, w, b, *, eps: float = 1e-6,
                  interpret: bool | None = None):
    """y = LN(x) @ w + b with the LN fused into the GEMM's row tiles (the
    f32 LN intermediate never reaches HBM). x: (..., D); w: (D, F)."""
    dt = x.dtype
    if jax.default_backend() != "tpu" and not interpret:
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
        ln = ((xf - mu) * jax.lax.rsqrt(jnp.maximum(var, 0.0) + eps)
              * ln_scale + ln_bias).astype(dt)
        return ln @ w.astype(dt) + b.astype(dt)
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    y = _fused_ln_gemm(
        x2, ln_scale.astype(jnp.float32), ln_bias.astype(jnp.float32),
        w.astype(dt), b.astype(dt), float(eps), bool(interpret),
    )
    return y.reshape(*lead, y.shape[-1])


def _gemm_res_fwd_kernel(res_ref, a_ref, w_ref, b_ref, y_ref, *, rows: int,
                         tile: int):
    i = pl.program_id(0)
    rowi = i * tile + jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
    res = jnp.where(rowi < rows, res_ref[...], 0)
    a = jnp.where(rowi < rows, a_ref[...], 0)
    y = jax.lax.dot_general(
        a, w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b_ref[...].astype(jnp.float32)
    y_ref[...] = res + y.astype(y_ref.dtype)


def _gemm_res_bwd_kernel(a_ref, dy_ref, w_ref, da_ref, dw_ref, db_ref,
                         dw_s, db_s, *, rows: int, tile: int):
    i = pl.program_id(0)
    n = pl.num_programs(0)

    @pl.when(i == 0)
    def _init():
        dw_s[:] = jnp.zeros_like(dw_s)
        db_s[:] = jnp.zeros_like(db_s)

    rowi = i * tile + jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
    a = jnp.where(rowi < rows, a_ref[...], 0)
    dy = jnp.where(rowi < rows, dy_ref[...], 0)
    da_ref[...] = jax.lax.dot_general(
        dy, w_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(da_ref.dtype)
    dw_s[:] += jax.lax.dot_general(
        a, dy, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    db_s[:] += jnp.sum(dy.astype(jnp.float32), axis=0, keepdims=True)

    @pl.when(i == n - 1)
    def _fin():
        dw_ref[...] = dw_s[:].astype(dw_ref.dtype)
        db_ref[...] = db_s[:].astype(db_ref.dtype)


def _gemm_res_forward(res2, a2, w, b, interpret):
    rows, f = a2.shape
    d = w.shape[1]
    tile = min(ROW_TILE, max(_cdiv(rows, 8) * 8, 8))
    return pl.pallas_call(
        functools.partial(_gemm_res_fwd_kernel, rows=rows, tile=tile),
        grid=(_cdiv(rows, tile),),
        in_specs=[
            pl.BlockSpec((tile, d), lambda i: (i, 0)),
            pl.BlockSpec((tile, f), lambda i: (i, 0)),
            pl.BlockSpec((f, d), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tile, d), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, d), a2.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(res2, a2, w, b.reshape(1, d))


def _gemm_res_backward(a2, dy2, w, interpret):
    rows, f = a2.shape
    d = w.shape[1]
    tile = min(ROW_TILE_BWD, max(_cdiv(rows, 8) * 8, 8))
    da, dw, db = pl.pallas_call(
        functools.partial(_gemm_res_bwd_kernel, rows=rows, tile=tile),
        grid=(_cdiv(rows, tile),),
        in_specs=[
            pl.BlockSpec((tile, f), lambda i: (i, 0)),
            pl.BlockSpec((tile, d), lambda i: (i, 0)),
            pl.BlockSpec((f, d), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((tile, f), lambda i: (i, 0)),
            pl.BlockSpec((f, d), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, f), a2.dtype),
            jax.ShapeDtypeStruct((f, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((f, d), jnp.float32),
            pltpu.VMEM((1, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=int(3e7),
        ),
        interpret=interpret,
    )(a2, dy2, w)
    return da, dw, db.reshape(d)


@functools.partial(custom_partitioning, static_argnums=(4,))
def _gemm_res_forward_p(res2, a2, w, b, interpret):
    return _gemm_res_forward(res2, a2, w, b, interpret)


def _gr_fwd_infer(interpret, mesh, arg_shapes, result_shape):
    spec = arg_shapes[0].sharding.spec
    lead = spec[0] if spec else None
    return NamedSharding(mesh, P(lead, None))


def _gr_fwd_partition(interpret, mesh, arg_shapes, result_shape):
    x_sh = _gr_fwd_infer(interpret, mesh, arg_shapes, result_shape)
    rep = NamedSharding(mesh, P(None, None))
    rep1 = NamedSharding(mesh, P(None))

    def lower(res2, a2, w, b):
        return _gemm_res_forward(res2, a2, w, b, interpret)

    return mesh, lower, x_sh, (x_sh, x_sh, rep, rep1)


_gemm_res_forward_p.def_partition(
    partition=_gr_fwd_partition,
    infer_sharding_from_operands=_gr_fwd_infer,
    sharding_rule="r d, r f, f d, d -> r d",
    need_replication_factors=("d", "f"),
)


@functools.partial(custom_partitioning, static_argnums=(3,))
def _gemm_res_backward_p(a2, dy2, w, interpret):
    return _gemm_res_backward(a2, dy2, w, interpret)


def _gr_bwd_infer(interpret, mesh, arg_shapes, result_shape):
    spec = arg_shapes[0].sharding.spec
    lead = spec[0] if spec else None
    a_sh = NamedSharding(mesh, P(lead, None))
    rep = NamedSharding(mesh, P(None, None))
    rep1 = NamedSharding(mesh, P(None))
    return (a_sh, rep, rep1)


def _gr_bwd_partition(interpret, mesh, arg_shapes, result_shape):
    outs = _gr_bwd_infer(interpret, mesh, arg_shapes, result_shape)
    a_sh = outs[0]
    rep = NamedSharding(mesh, P(None, None))
    psum_axes = _row_sharded_axes(mesh, arg_shapes[0])

    def lower(a2, dy2, w):
        res = _gemm_res_backward(a2, dy2, w, interpret)
        if psum_axes:
            da = res[0]
            rest = tuple(jax.lax.psum(t, psum_axes) for t in res[1:])
            return (da,) + rest
        return res

    return mesh, lower, outs, (a_sh, a_sh, rep)


_gemm_res_backward_p.def_partition(
    partition=_gr_bwd_partition,
    infer_sharding_from_operands=_gr_bwd_infer,
    sharding_rule="r f, r d, f d -> r f, f d, d",
    need_replication_factors=("f", "d"),
)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _fused_gemm_res(res2, a2, w, b, interpret):
    return _gemm_res_forward_p(res2, a2, w, b, interpret)


def _fused_gemm_res_fwd(res2, a2, w, b, interpret):
    return _gemm_res_forward_p(res2, a2, w, b, interpret), (a2, w)


def _fused_gemm_res_bwd(interpret, res, dy):
    a2, w = res
    da, dw, db = _gemm_res_backward_p(a2, dy, w, interpret)
    # residual path: d(res) = dy unchanged
    return dy, da, dw.astype(w.dtype), db.astype(w.dtype)


_fused_gemm_res.defvjp(_fused_gemm_res_fwd, _fused_gemm_res_bwd)


def fused_gemm_residual(res, a, w, b, *, interpret: bool | None = None):
    """y = res + a @ w + b (output projection + residual add as one op).
    res: (..., D); a: (..., F); w: (F, D)."""
    dt = res.dtype
    if jax.default_backend() != "tpu" and not interpret:
        return res + (a @ w.astype(a.dtype) + b.astype(a.dtype)).astype(dt)
    lead = res.shape[:-1]
    res2 = res.reshape(-1, res.shape[-1])
    a2 = a.reshape(-1, a.shape[-1])
    y = _fused_gemm_res(res2, a2, w.astype(dt), b.astype(dt), bool(interpret))
    return y.reshape(*lead, y.shape[-1])
