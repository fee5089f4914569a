"""Hybrid dense layer: XLA forward, Pallas dual-output backward.

Motivation (profiled, BENCH.md round-3 closing accounting): with the MLP
family back on XLA, the step's forward mega-fusions run at 85-95% MFU but
the backward dgrad+wgrad+dbias *multi-output fusions* sit at 56-79% — an
emitter property (splitting them re-reads the shared gradient operand from
HBM, measured worse via xla_jf_enable_multi_output_fusion=false: -16%).

This op keeps the forward in XLA — so the fc/qkv/proj GEMMs keep fusing
into XLA's forward mega-chains — and replaces ONLY the backward with one
Pallas kernel that reads the upstream gradient dy once per row tile and
produces all three outputs:

    dx = dy @ Wᵀ          (row-parallel)
    dW = Σ_tiles xᵀ dy    (f32 VMEM accumulator across the sequential grid)
    db = Σ rows dy        (f32 VMEM accumulator)

Replaces the reference's cuDNN dgrad/wgrad kernel pair per Linear
(timm ViT qkv/proj/fc layers, reference train.py:1045).
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


def _bwd_vmem_ok(d: int, n: int) -> bool:
    """f32 dW accumulator + the row tile's dy (bf16 + one f32 temp for the
    db sum) + x/dx tiles + the bf16 weight, with margin, against the 30 MB
    scoped-VMEM limit the kernel requests (double-buffered inputs)."""
    acc = d * n * 4
    tiles = ROW_TILE * n * (2 + 4) + 2 * ROW_TILE * d * 2
    weight = d * n * 2
    return acc + 2 * tiles + weight < int(2.6e7)


def _dense_bwd_kernel(x_ref, dy_ref, w_ref, dx_ref, dw_ref, db_ref,
                      dw_s, db_s, *, rows: int, tile: int):
    i = pl.program_id(0)
    nprog = pl.num_programs(0)

    @pl.when(i == 0)
    def _init():
        dw_s[:] = jnp.zeros_like(dw_s)
        db_s[:] = jnp.zeros_like(db_s)

    rowi = i * tile + jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
    x = jnp.where(rowi < rows, x_ref[...], 0)
    dy = jnp.where(rowi < rows, dy_ref[...], 0)
    # dx = dy @ Wᵀ (contract the feature dims — no transpose materialized)
    dx = jax.lax.dot_general(
        dy, w_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dx_ref[...] = dx.astype(dx_ref.dtype)
    # dW/db accumulate in VMEM across the sequential row grid
    dw_s[:] += jax.lax.dot_general(
        x, dy, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    db_s[:] += jnp.sum(dy.astype(jnp.float32), axis=0, keepdims=True)

    @pl.when(i == nprog - 1)
    def _fin():
        dw_ref[...] = dw_s[:].astype(dw_ref.dtype)
        db_ref[...] = db_s[:].astype(db_ref.dtype)


def _dense_backward(x2, dy2, w, interpret):
    rows, d = x2.shape
    n = w.shape[1]
    tile = min(ROW_TILE, max(_cdiv(rows, 8) * 8, 8))
    grid = (_cdiv(rows, tile),)
    dx, dw, db = pl.pallas_call(
        functools.partial(_dense_bwd_kernel, rows=rows, tile=tile),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, d), lambda i: (i, 0)),
            pl.BlockSpec((tile, n), lambda i: (i, 0)),
            pl.BlockSpec((d, n), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((tile, d), lambda i: (i, 0)),
            pl.BlockSpec((d, n), lambda i: (0, 0)),
            pl.BlockSpec((1, n), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, d), x2.dtype),
            jax.ShapeDtypeStruct((d, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((d, n), jnp.float32),
            pltpu.VMEM((1, n), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=int(3e7),
        ),
        interpret=interpret,
    )(x2, dy2, w)
    return dx, dw, db.reshape(n)


def _row_sharded_axes(arg_shape):
    spec = arg_shape.sharding.spec
    if not spec or spec[0] is None:
        return ()
    s = spec[0]
    return tuple(s) if isinstance(s, tuple) else (s,)


@functools.partial(custom_partitioning, static_argnums=(3,))
def _dense_backward_p(x2, dy2, w, interpret):
    return _dense_backward(x2, dy2, w, interpret)


def _dense_bwd_infer(interpret, mesh, arg_shapes, result_shape):
    spec = arg_shapes[0].sharding.spec
    lead = spec[0] if spec else None
    return (
        NamedSharding(mesh, P(lead, None)),
        NamedSharding(mesh, P(None, None)),
        NamedSharding(mesh, P(None)),
    )


def _dense_bwd_partition(interpret, mesh, arg_shapes, result_shape):
    outs = _dense_bwd_infer(interpret, mesh, arg_shapes, result_shape)
    x_sh = outs[0]
    rep = NamedSharding(mesh, P(None, None))
    psum_axes = _row_sharded_axes(arg_shapes[0])

    def lower(x2, dy2, w):
        dx, dw, db = _dense_backward(x2, dy2, w, interpret)
        if psum_axes:
            # rows sharded: weight/bias grads are per-shard partial sums
            dw = jax.lax.psum(dw, psum_axes)
            db = jax.lax.psum(db, psum_axes)
        return dx, dw, db

    return mesh, lower, outs, (x_sh, x_sh, rep)


_dense_backward_p.def_partition(
    partition=_dense_bwd_partition,
    infer_sharding_from_operands=_dense_bwd_infer,
    sharding_rule="r d, r n, d n -> r d, d n, n",
    need_replication_factors=("d", "n"),
)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _hybrid_dense(x, w, b, interpret):
    # Forward stays pure XLA (rank preserved) so it keeps fusing into the
    # surrounding forward mega-fusions; only the VJP is custom.
    y = x @ w
    if b is not None:
        y = y + b
    return y


def _hybrid_dense_fwd(x, w, b, interpret):
    return _hybrid_dense(x, w, b, interpret), (x, w, b is not None)


def _hybrid_dense_bwd(interpret, res, dy):
    x, w, has_bias = res
    d = x.shape[-1]
    n = w.shape[-1]
    dx, dw, db = _dense_backward_p(
        x.reshape(-1, d), dy.astype(x.dtype).reshape(-1, n), w, interpret
    )
    return (
        dx.reshape(x.shape),
        dw.astype(w.dtype),
        db.astype(w.dtype) if has_bias else None,
    )


_hybrid_dense.defvjp(_hybrid_dense_fwd, _hybrid_dense_bwd)


def hybrid_dense(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array | None = None,
    *,
    interpret: bool | None = None,
) -> jax.Array:
    """y = x @ w (+ b) with an XLA forward and a Pallas dual-output backward
    (dx, dW, db from ONE read of dy per row tile — replaces XLA's backward
    dgrad+wgrad+dbias multi-output fusion, measured at 56-79% MFU in-step).

    x: (..., D); w: (D, N); b: (N,) or None — computed in x.dtype (cast w/b
    before the call for mixed precision, as nn.Dense does). Dispatches to
    the Pallas backward on TPU when the f32 dW accumulator fits VMEM
    (ViT-S/B dense shapes fit); plain XLA VJP elsewhere.
    """
    dt = x.dtype
    use_pallas = (
        jax.default_backend() == "tpu"
        and _bwd_vmem_ok(w.shape[0], w.shape[1])
    ) or interpret
    if not use_pallas:
        y = x @ w.astype(dt)
        return y + b.astype(dt) if b is not None else y
    return _hybrid_dense(
        x, w.astype(dt), None if b is None else b.astype(dt),
        bool(interpret),
    )
