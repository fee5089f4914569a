"""Fused multi-head attention for TPU (Pallas flash-attention kernel).

TPU-native replacement for the cuDNN attention inside the reference's timm ViT
forward (reference: train.py:1045 model(...) → timm blocks). Design:

- Flash-attention style online-softmax kernel, gridded over
  ``(batch*heads, q_blocks, k_blocks)`` with the K axis innermost so the
  running max/denominator/accumulator live in VMEM scratch across K steps.
- fp32 accumulation on the MXU (``preferred_element_type``), bf16 I/O.
- Optional per-(batch*head) key-length masking via scalar prefetch, so padded
  slide-inference chunks and variable-length MIL bags (datasets.py:694-699
  ``tiles_per_iter`` chunking; bag axis up to 500 tiles) attend only to real
  tokens.
- Blockwise Pallas backward (FlashAttention-2 style): the stats forward saves
  the per-row logsumexp, and dQ/dK/dV kernels rebuild p tile-by-tile — O(S)
  memory in BOTH directions, so long-bag training never materializes (S, S).

On non-TPU backends (CPU test mesh) we fall back to the XLA reference
implementation; the Pallas kernel itself is additionally unit-tested in
interpreter mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.custom_partitioning import custom_partitioning
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import NamedSharding, PartitionSpec as P

NEG_INF = -1e30


def _keep_leading_spec(mesh, shape_with_sharding, n_lead):
    """Sharding that keeps the operand's leading (batch/head) axis placement
    and replicates every trailing axis — the per-shard contract of the
    whole-sequence kernels (each program consumes full rows of seq × dim)."""
    spec = shape_with_sharding.sharding.spec
    lead = tuple(spec[i] if i < len(spec) else None for i in range(n_lead))
    ndim = len(shape_with_sharding.shape)
    return NamedSharding(mesh, P(*lead, *([None] * (ndim - n_lead))))


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def attention_reference(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    kv_lengths: jax.Array | None = None,
    scale: float | None = None,
) -> jax.Array:
    """XLA softmax attention. q/k/v: (B, H, S, D). kv_lengths: (B,) or None."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if kv_lengths is not None:
        kidx = jnp.arange(k.shape[2])[None, None, None, :]
        mask = kidx < kv_lengths[:, None, None, None]
        s = jnp.where(mask, s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", p.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    return out.astype(q.dtype)


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------


def _flash_kernel(
    lengths_ref,  # scalar prefetch: (BH,) int32
    q_ref,  # (1, TQ, D)
    k_ref,  # (1, TK, D)
    v_ref,  # (1, TK, D)
    o_ref,  # (1, TQ, D)
    m_scratch,  # (TQ, 128) f32
    l_scratch,  # (TQ, 128) f32
    acc_scratch,  # (TQ, D) f32
    *,
    scale: float,
    tile_k: int,
):
    bh = pl.program_id(0)
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, NEG_INF)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    q = q_ref[0]
    k = k_ref[0]
    s = jax.lax.dot_general(
        q,
        k,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # (TQ, TK)

    # Mask out padded keys beyond this batch-head's true kv length.
    kv_len = lengths_ref[bh]
    global_k = ki * tile_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    key_valid = global_k < kv_len
    s = jnp.where(key_valid, s, NEG_INF)

    m_prev = m_scratch[:, 0:1]  # (TQ, 1)
    m_cur = jnp.max(s, axis=1, keepdims=True)  # (TQ, 1)
    m_new = jnp.maximum(m_prev, m_cur)

    # Zero p explicitly: when EVERY key in the tile is masked, m_new is also
    # NEG_INF and exp(s - m_new) = exp(0) = 1 — without this mask a fully-
    # masked row would silently average all of v (and l would never be 0, so
    # the _finalize / lse guards could not catch it).
    p = jnp.where(key_valid, jnp.exp(s - m_new), 0.0)  # (TQ, TK)
    alpha = jnp.exp(m_prev - m_new)  # (TQ, 1)

    l_prev = l_scratch[:, 0:1]
    l_new = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)

    acc_scratch[:] = acc_scratch[:] * alpha + jax.lax.dot_general(
        p.astype(v_ref.dtype),
        v_ref[0],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_scratch[:] = jnp.broadcast_to(m_new, m_scratch.shape)
    l_scratch[:] = jnp.broadcast_to(l_new, l_scratch.shape)

    @pl.when(ki == nk - 1)
    def _finalize():
        l = l_scratch[:, 0:1]
        l = jnp.where(l == 0.0, 1.0, l)  # fully-masked rows → zeros not NaN
        o_ref[0] = (acc_scratch[:] / l).astype(o_ref.dtype)


def _flash_kernel_stats(
    lengths_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
    m_scratch, l_scratch, acc_scratch, *, scale: float, tile_k: int,
):
    """Forward variant that also writes the per-row logsumexp L = m + log(l)
    — the only residual (besides q/k/v/o) the blockwise backward needs."""
    _flash_kernel(
        lengths_ref, q_ref, k_ref, v_ref, o_ref,
        m_scratch, l_scratch, acc_scratch, scale=scale, tile_k=tile_k,
    )
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == nk - 1)
    def _write_lse():
        l = l_scratch[:, 0:1]
        # Fully-masked rows (kv_len == 0) have l == 0; m is NEG_INF there, so
        # m + log(max(l, eps)) would be ~ -1e30 and the blockwise backward's
        # p = exp(s - lse) would explode to exp(+1e30 - …) garbage. Write
        # lse = 0 instead: masked scores are NEG_INF, so exp(s - 0) = 0 and
        # every gradient contribution from the masked row vanishes.
        lse = m_scratch[:, 0:1] + jnp.log(jnp.maximum(l, 1e-30))
        # lse rides a (BH, 1, SQpad) array: Mosaic requires the block's last
        # two dims to divide (8, 128) or equal the array dims — a 2-D
        # (1, tile_q) block over (BH, SQpad) is ILLEGAL on real TPU for
        # BH > 1 (caught by scripts/bench_longseq.py; interpret-mode tests
        # don't check block shapes). The singleton middle dim satisfies the
        # sublane rule exactly.
        lse_ref[0, 0] = jnp.where(l == 0.0, 0.0, lse)[:, 0]


def _flash_forward(q, k, v, kv_lengths, scale, tile_q, tile_k, interpret,
                   return_stats=False):
    b, h, s_q, d = q.shape
    s_k = k.shape[2]
    bh = b * h

    tile_q = min(tile_q, max(s_q, 8))
    tile_k = min(tile_k, max(s_k, 8))
    pad_q = _cdiv(s_q, tile_q) * tile_q - s_q
    pad_k = _cdiv(s_k, tile_k) * tile_k - s_k

    qf = q.reshape(bh, s_q, d)
    kf = k.reshape(bh, s_k, d)
    vf = v.reshape(bh, s_k, d)
    if pad_q:
        qf = jnp.pad(qf, ((0, 0), (0, pad_q), (0, 0)))
    if pad_k:
        kf = jnp.pad(kf, ((0, 0), (0, pad_k), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, pad_k), (0, 0)))

    if kv_lengths is None:
        lengths = jnp.full((b,), s_k, dtype=jnp.int32)
    else:
        lengths = kv_lengths.astype(jnp.int32)
    lengths_bh = jnp.repeat(lengths, h)  # (BH,)

    nq = qf.shape[1] // tile_q
    nk = kf.shape[1] // tile_k

    out_specs = pl.BlockSpec((1, tile_q, d), lambda bh, qi, ki, lens: (bh, qi, 0))
    out_shape = jax.ShapeDtypeStruct(qf.shape, q.dtype)
    kernel = functools.partial(_flash_kernel, scale=scale, tile_k=tile_k)
    if return_stats:
        out_specs = [
            out_specs,
            pl.BlockSpec((1, 1, tile_q), lambda bh, qi, ki, lens: (bh, 0, qi)),
        ]
        out_shape = [
            out_shape,
            jax.ShapeDtypeStruct((bh, 1, qf.shape[1]), jnp.float32),
        ]
        kernel = functools.partial(
            _flash_kernel_stats, scale=scale, tile_k=tile_k
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bh, nq, nk),
        in_specs=[
            pl.BlockSpec((1, tile_q, d), lambda bh, qi, ki, lens: (bh, qi, 0)),
            pl.BlockSpec((1, tile_k, d), lambda bh, qi, ki, lens: (bh, ki, 0)),
            pl.BlockSpec((1, tile_k, d), lambda bh, qi, ki, lens: (bh, ki, 0)),
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((tile_q, 128), jnp.float32),
            pltpu.VMEM((tile_q, 128), jnp.float32),
            pltpu.VMEM((tile_q, d), jnp.float32),
        ],
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(lengths_bh, qf, kf, vf)

    if return_stats:
        out, lse = out
        if pad_q:
            out = out[:, :s_q, :]
        # keep the external (BH, SQpad) contract
        return out.reshape(b, h, s_q, d), lse.reshape(bh, -1)

    if pad_q:
        out = out[:, :s_q, :]
    return out.reshape(b, h, s_q, d)


def _flash_bwd_dq_kernel(
    lengths_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    dq_ref, dq_scratch, *, scale: float, tile_k: int,
):
    """Blockwise dQ: grid (BH, nq, nk) with K innermost; for each K tile,
    rebuild p from (q, k, L) FlashAttention-2 style and accumulate
    dq += dS·K in VMEM. O(tile²) memory, never the full (S, S) matrix."""
    bh = pl.program_id(0)
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        dq_scratch[:] = jnp.zeros_like(dq_scratch)

    q = q_ref[0]
    k = k_ref[0]
    # Transposed layout (keys on rows, like the whole-seq kernels): lse and
    # delta arrive as (1, TQ) row vectors and broadcast along rows without
    # any in-kernel transpose or column reshape.
    st = jax.lax.dot_general(
        k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (TK, TQ)
    kv_len = lengths_ref[bh]
    gk = ki * tile_k + jax.lax.broadcasted_iota(jnp.int32, st.shape, 0)
    st = jnp.where(gk < kv_len, st, NEG_INF)
    pt = jnp.exp(st - lse_ref[0])  # (TK, TQ) f32, lse block (1, 1, TQ)
    dpt = jax.lax.dot_general(
        v_ref[0], do_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (TK, TQ)
    dst = (pt * (dpt - delta_ref[0]) * scale).astype(k.dtype)
    # dq[i, c] = Σ_j dst[j, i] k[j, c]
    dq_scratch[:] += jax.lax.dot_general(
        dst, k, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(ki == nk - 1)
    def _fin():
        dq_ref[0] = dq_scratch[:].astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(
    lengths_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    dk_ref, dv_ref, dk_scratch, dv_scratch, *, scale: float, tile_k: int,
):
    """Blockwise dK/dV: grid (BH, nk, nq) with Q innermost; scores built
    transposed (keys on rows) so dV = pᵀ·dO and dK = dSᵀ·Q come out without
    in-kernel transposes."""
    bh = pl.program_id(0)
    ki = pl.program_id(1)
    qi = pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(qi == 0)
    def _init():
        dk_scratch[:] = jnp.zeros_like(dk_scratch)
        dv_scratch[:] = jnp.zeros_like(dv_scratch)

    q = q_ref[0]
    k = k_ref[0]
    st = jax.lax.dot_general(
        k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (TK, TQ)
    kv_len = lengths_ref[bh]
    gk = ki * tile_k + jax.lax.broadcasted_iota(jnp.int32, st.shape, 0)
    st = jnp.where(gk < kv_len, st, NEG_INF)
    pt = jnp.exp(st - lse_ref[0])  # (TK, TQ) f32, lse block (1, 1, TQ)
    do = do_ref[0]
    dv_scratch[:] += jax.lax.dot_general(
        pt.astype(do.dtype), do, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dpt = jax.lax.dot_general(
        v_ref[0], do, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dst = (pt * (dpt - delta_ref[0]) * scale).astype(q.dtype)
    dk_scratch[:] += jax.lax.dot_general(
        dst, q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(qi == nq - 1)
    def _fin():
        dk_ref[0] = dk_scratch[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scratch[:].astype(dv_ref.dtype)


def _flash_backward(q, k, v, o, do, lse, scale, tile_q, tile_k, interpret):
    """Blockwise flash backward (ADVICE round-1: the previous backward
    materialized the full (B, H, S, S) attention in XLA, so training-time
    memory regressed to O(S²) exactly on the long sequences the flash
    forward exists for). Residuals: q/k/v/o + per-row logsumexp from the
    stats forward; delta = rowsum(dO∘O) computed in XLA (cheap elementwise).
    """
    b, h, s_q, d = q.shape
    s_k = k.shape[2]
    bh = b * h
    tile_q = min(tile_q, max(s_q, 8))
    tile_k = min(tile_k, max(s_k, 8))
    pad_q = _cdiv(s_q, tile_q) * tile_q - s_q
    pad_k = _cdiv(s_k, tile_k) * tile_k - s_k

    # lse/delta ride (BH, 1, SQpad) arrays with (1, 1, tile_q) blocks — the
    # singleton sublane dim is what makes the row-vector block legal on
    # real TPU (Mosaic last-two-dims rule; see _write_lse).
    delta = jnp.sum(
        do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1
    ).reshape(bh, 1, s_q)
    qf = q.reshape(bh, s_q, d)
    kf = k.reshape(bh, s_k, d)
    vf = v.reshape(bh, s_k, d)
    dof = do.reshape(bh, s_q, d)
    lsef = lse.reshape(bh, 1, -1)  # already padded to SQpad by the forward
    if pad_q:
        qf = jnp.pad(qf, ((0, 0), (0, pad_q), (0, 0)))
        dof = jnp.pad(dof, ((0, 0), (0, pad_q), (0, 0)))
        delta = jnp.pad(delta, ((0, 0), (0, 0), (0, pad_q)))
    if pad_k:
        kf = jnp.pad(kf, ((0, 0), (0, pad_k), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, pad_k), (0, 0)))

    lengths_bh = jnp.full((bh,), s_k, dtype=jnp.int32)
    nq = qf.shape[1] // tile_q
    nk = kf.shape[1] // tile_k

    qspec = pl.BlockSpec((1, tile_q, d), lambda bh, qi, ki, lens: (bh, qi, 0))
    kspec = pl.BlockSpec((1, tile_k, d), lambda bh, qi, ki, lens: (bh, ki, 0))
    rowq = pl.BlockSpec((1, 1, tile_q), lambda bh, qi, ki, lens: (bh, 0, qi))
    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, scale=scale, tile_k=tile_k),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bh, nq, nk),
            in_specs=[qspec, kspec, kspec, qspec, rowq, rowq],
            out_specs=qspec,
            scratch_shapes=[pltpu.VMEM((tile_q, d), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct(qf.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(lengths_bh, qf, kf, vf, dof, lsef, delta)

    qspec2 = pl.BlockSpec((1, tile_q, d), lambda bh, ki, qi, lens: (bh, qi, 0))
    kspec2 = pl.BlockSpec((1, tile_k, d), lambda bh, ki, qi, lens: (bh, ki, 0))
    rowq2 = pl.BlockSpec((1, 1, tile_q), lambda bh, ki, qi, lens: (bh, 0, qi))
    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, scale=scale, tile_k=tile_k),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bh, nk, nq),
            in_specs=[qspec2, kspec2, kspec2, qspec2, rowq2, rowq2],
            out_specs=[kspec2, kspec2],
            scratch_shapes=[
                pltpu.VMEM((tile_k, d), jnp.float32),
                pltpu.VMEM((tile_k, d), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct(kf.shape, k.dtype),
            jax.ShapeDtypeStruct(vf.shape, v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(lengths_bh, qf, kf, vf, dof, lsef, delta)

    if pad_q:
        dq = dq[:, :s_q, :]
    if pad_k:
        dk = dk[:, :s_k, :]
        dv = dv[:, :s_k, :]
    return (
        dq.reshape(b, h, s_q, d),
        dk.reshape(b, h, s_k, d),
        dv.reshape(b, h, s_k, d),
    )


# Partitioner registration for the flash kernel: batch and head axes may be
# sharded (the grid is (B·H, …) — fully independent programs); seq/head_dim
# replicated. See the _mha_qkv registration below for rationale.
@functools.partial(custom_partitioning, static_argnums=(3, 4, 5, 6))
def _flash_forward_p(q, k, v, scale, tile_q, tile_k, interpret):
    return _flash_forward(q, k, v, None, scale, tile_q, tile_k, interpret)


def _flash_infer(scale, tile_q, tile_k, interpret, mesh, arg_shapes,
                 result_shape):
    return _keep_leading_spec(mesh, arg_shapes[0], 2)


def _flash_partition(scale, tile_q, tile_k, interpret, mesh, arg_shapes,
                     result_shape):
    shs = tuple(_keep_leading_spec(mesh, a, 2) for a in arg_shapes)

    def lower(q, k, v):
        return _flash_forward(q, k, v, None, scale, tile_q, tile_k, interpret)

    return mesh, lower, shs[0], shs


_flash_forward_p.def_partition(
    partition=_flash_partition,
    infer_sharding_from_operands=_flash_infer,
    sharding_rule="b h s d, b h t d, b h t d -> b h s d",
    need_replication_factors=("s", "d", "t"),  # first-appearance order
)


@functools.partial(custom_partitioning, static_argnums=(4, 5, 6, 7))
def _flash_forward_masked_p(q, k, v, kv_lengths, scale, tile_q, tile_k,
                            interpret):
    return _flash_forward(q, k, v, kv_lengths, scale, tile_q, tile_k,
                          interpret)


def _flash_masked_infer(scale, tile_q, tile_k, interpret, mesh, arg_shapes,
                        result_shape):
    return _keep_leading_spec(mesh, arg_shapes[0], 2)


def _flash_masked_partition(scale, tile_q, tile_k, interpret, mesh,
                            arg_shapes, result_shape):
    shs = tuple(_keep_leading_spec(mesh, a, 2) for a in arg_shapes[:3])
    len_sh = _keep_leading_spec(mesh, arg_shapes[3], 1)

    def lower(q, k, v, lengths):
        return _flash_forward(q, k, v, lengths, scale, tile_q, tile_k,
                              interpret)

    return mesh, lower, shs[0], shs + (len_sh,)


_flash_forward_masked_p.def_partition(
    partition=_flash_masked_partition,
    infer_sharding_from_operands=_flash_masked_infer,
    sharding_rule="b h s d, b h t d, b h t d, b -> b h s d",
    need_replication_factors=("s", "d", "t"),  # first-appearance order
)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _fused_attention(q, k, v, scale, tile_q, tile_k, interpret):
    return _flash_forward_p(q, k, v, scale, tile_q, tile_k, interpret)


@functools.partial(custom_partitioning, static_argnums=(3, 4, 5, 6))
def _flash_forward_stats_p(q, k, v, scale, tile_q, tile_k, interpret):
    out, lse = _flash_forward(q, k, v, None, scale, tile_q, tile_k,
                              interpret, return_stats=True)
    b, h = q.shape[0], q.shape[1]
    return out, lse.reshape(b, h, -1)


def _flash_stats_infer(scale, tile_q, tile_k, interpret, mesh, arg_shapes,
                       result_shape):
    o_sh = _keep_leading_spec(mesh, arg_shapes[0], 2)
    lse_sh = NamedSharding(
        mesh, P(*o_sh.spec[:2], None)
    )
    return (o_sh, lse_sh)


def _flash_stats_partition(scale, tile_q, tile_k, interpret, mesh, arg_shapes,
                           result_shape):
    shs = tuple(_keep_leading_spec(mesh, a, 2) for a in arg_shapes)
    out_sh = _flash_stats_infer(scale, tile_q, tile_k, interpret, mesh,
                                arg_shapes, result_shape)

    def lower(q, k, v):
        out, lse = _flash_forward(q, k, v, None, scale, tile_q, tile_k,
                                  interpret, return_stats=True)
        return out, lse.reshape(q.shape[0], q.shape[1], -1)

    return mesh, lower, out_sh, shs


_flash_forward_stats_p.def_partition(
    partition=_flash_stats_partition,
    infer_sharding_from_operands=_flash_stats_infer,
    sharding_rule="b h s d, b h t d, b h t d -> b h s d, b h p",
    need_replication_factors=("s", "d", "t", "p"),
)


@functools.partial(custom_partitioning, static_argnums=(6, 7, 8, 9))
def _flash_backward_p(q, k, v, o, do, lse, scale, tile_q, tile_k, interpret):
    return _flash_backward(q, k, v, o, do, lse, scale, tile_q, tile_k,
                           interpret)


def _flash_bwd_infer(scale, tile_q, tile_k, interpret, mesh, arg_shapes,
                     result_shape):
    return tuple(_keep_leading_spec(mesh, a, 2) for a in arg_shapes[:3])


def _flash_bwd_partition(scale, tile_q, tile_k, interpret, mesh, arg_shapes,
                         result_shape):
    shs = tuple(_keep_leading_spec(mesh, a, 2) for a in arg_shapes)

    def lower(q, k, v, o, do, lse):
        return _flash_backward(q, k, v, o, do, lse, scale, tile_q, tile_k,
                               interpret)

    return mesh, lower, shs[:3], shs


_flash_backward_p.def_partition(
    partition=_flash_bwd_partition,
    infer_sharding_from_operands=_flash_bwd_infer,
    sharding_rule=(
        "b h s d, b h t d, b h t d, b h s d, b h s d, b h p "
        "-> b h s d, b h t d, b h t d"
    ),
    need_replication_factors=("s", "d", "t", "p"),
)


def _fused_fwd(q, k, v, scale, tile_q, tile_k, interpret):
    out, lse = _flash_forward_stats_p(q, k, v, scale, tile_q, tile_k,
                                      interpret)
    return out, (q, k, v, out, lse)


def _fused_bwd(scale, tile_q, tile_k, interpret, res, g):
    # Blockwise Pallas backward (FlashAttention-2 style): residuals are
    # q/k/v/o plus the per-row logsumexp from the stats forward; p is rebuilt
    # tile-by-tile, so training-time memory stays O(S·tile) — the previous
    # XLA backward materialized the full (B, H, S, S) attention, regressing
    # to O(S²) exactly on the long sequences this kernel exists for
    # (MIL bags, full-slide token streams, datasets.py:694-699 chunking).
    q, k, v, o, lse = res
    return _flash_backward_p(q, k, v, o, g, lse, scale, tile_q, tile_k,
                             interpret)


_fused_attention.defvjp(_fused_fwd, _fused_bwd)


MIN_PALLAS_SEQ = 512


# ---------------------------------------------------------------------------
# Whole-sequence multi-head kernel operating on the raw qkv GEMM output.
#
# For ViT-length sequences (197-257 tokens) the whole attention for one image
# fits VMEM, so one program per batch element computes every head with NO
# transposes anywhere: input is the qkv Dense output (B, N, 3·D) laid out
# [which(3), head, head_dim] along columns; output is (B, N, D) ready for the
# output projection. This removes both the O(S²) HBM traffic of XLA's
# materialized softmax AND the 4 layout copies per attention layer.
# ---------------------------------------------------------------------------


_WIDE_VMEM_LIMIT = int(3e7)


def _wide_vmem_ok(num_heads: int, seq_pad: int, d: int, itemsize: int) -> bool:
    """Whether the wide-softmax kernels' VMEM working set fits the ~30 MB we
    request: the BACKWARD is the binding case — two (H·S_pad, S_pad) f32
    scratches plus double-buffered qkv/g/dqkv blocks. Gating on the backward
    keeps fwd and bwd dispatch consistent (the vjp pairs them). Beyond this,
    mha_from_qkv falls back to the O(S) flash kernel / XLA."""
    scratch = 2 * num_heads * seq_pad * seq_pad * 4
    io = 2 * seq_pad * (3 * d + d + 3 * d) * itemsize
    return scratch + io < int(0.9 * _WIDE_VMEM_LIMIT)


def _mha_qkv_kernel(q_len_ref, qkv_ref, o_ref, st_ref, *, num_heads: int,
                    seq_pad: int, scale: float, block_len: int):
    """Whole-sequence MHA, one program per batch element, ALL heads.

    Structure (measured on v5e, scripts/exp_attn2.py): per-head QKᵀ/PV dots
    are near their shape-limited MXU ceiling, but per-head softmax VPU work
    dominates when interleaved — so the H score matrices are written into ONE
    (H·S, S) scratch and the masked softmax runs as a single wide VPU pass
    (26% faster fwd, 1.57× fwd+bwd vs the interleaved per-head version).
    Layout: st[h·S + j, i] = k_hj · q_hi (keys on rows → the key mask is a
    plain row mask, and both dots consume st without transposes).

    Sequence packing: when block_len < seq_pad, the "sequence" axis is a
    concatenation of several independent short sequences of block_len tokens
    (multi-crop local views: 37 tokens would waste 91% of the 128-row tile).
    The mask becomes block-diagonal (key j attends query i only when
    j//block_len == i//block_len), which costs nothing extra — it fuses into
    the same wide masked-softmax pass. Fully padded query columns softmax to
    uniform (finite NEG_INF ⇒ exp(0)) and are sliced away by the caller.
    """
    d = qkv_ref.shape[2] // 3
    hd = d // num_heads
    R = num_heads * seq_pad
    n = q_len_ref[0]
    # The caller no longer pads the sequence axis in HBM (a full copy of the
    # 100+ MB qkv per attention call): the block simply overruns the array
    # and Pallas masks the ragged edge. OOB reads are UNDEFINED — they can
    # hold NaN/Inf bit patterns that would poison every dot they touch — so
    # zero the padded rows explicitly (one cheap VPU pass, exactly the bytes
    # the old jnp.pad produced).
    rowi = jax.lax.broadcasted_iota(jnp.int32, (seq_pad, 1), 0)
    qkv = jnp.where(rowi < n, qkv_ref[0], 0)  # (S_pad, 3D)
    # Fold the softmax scale into q once: (S, D) multiply instead of a
    # per-head (S, S) multiply on every score matrix.
    q_all = (qkv[:, :d].astype(jnp.float32) * scale).astype(qkv.dtype)
    for h in range(num_heads):
        k = qkv[:, d + h * hd : d + (h + 1) * hd]
        st_ref[h * seq_pad : (h + 1) * seq_pad, :] = jax.lax.dot_general(
            k, q_all[:, h * hd : (h + 1) * hd],
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        )
    rowj = jax.lax.broadcasted_iota(jnp.int32, (R, seq_pad), 0)
    keyj = rowj % seq_pad
    valid = keyj < n
    if block_len < seq_pad:
        coli = jax.lax.broadcasted_iota(jnp.int32, (R, seq_pad), 1)
        valid &= (keyj // block_len) == (coli // block_len)
    st = jnp.where(valid, st_ref[:], NEG_INF)
    s3 = st.reshape(num_heads, seq_pad, seq_pad)
    m = jnp.max(s3, axis=1, keepdims=True)
    e = jnp.exp(s3 - m)
    l = jnp.sum(e, axis=1, keepdims=True)
    p = (e / l).reshape(R, seq_pad).astype(qkv.dtype)
    for h in range(num_heads):
        v = qkv[:, 2 * d + h * hd : 2 * d + (h + 1) * hd]
        o = jax.lax.dot_general(
            p[h * seq_pad : (h + 1) * seq_pad, :], v,
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        o_ref[0, :, h * hd : (h + 1) * hd] = o.astype(o_ref.dtype)


def _mha_qkv_forward(qkv, num_heads, scale, interpret, block_len=0):
    b, n, d3 = qkv.shape
    seq_pad = max(_cdiv(n, 128) * 128, 128)
    if not block_len:
        block_len = seq_pad
    # No jnp.pad / output slice: blocks overrun the (b, n, ·) arrays and
    # Pallas masks the ragged edge (OOB reads handled by the in-kernel row
    # zeroing; OOB writes dropped). The explicit pad+slice pair used to move
    # ~7 GB/step of pure copy traffic in the DINO step (profiled).
    lengths = jnp.full((1,), n, dtype=jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, seq_pad, d3), lambda i, lens: (i, 0, 0))],
        out_specs=pl.BlockSpec(
            (1, seq_pad, d3 // 3), lambda i, lens: (i, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((num_heads * seq_pad, seq_pad), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _mha_qkv_kernel, num_heads=num_heads, seq_pad=seq_pad,
            scale=scale, block_len=block_len,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, n, d3 // 3), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=_WIDE_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(lengths, qkv)
    return out


def _mha_qkv_bwd_kernel(q_len_ref, qkv_ref, g_ref, dqkv_ref, st_ref, dp_ref,
                        *, num_heads: int, seq_pad: int, scale: float,
                        block_len: int):
    """Analytic attention backward, one program per batch element, all heads;
    recomputes p from qkv (flash-style: nothing else saved) and writes dqkv
    in the fused [which, head, hd] layout — no transposes.

    Same wide-softmax structure as the forward: score/softmax/dS elementwise
    work runs as single (H·S, S) VPU passes instead of per-head, and the five
    dots per head run in bf16 (fp32 accumulate) instead of fp32 operands —
    measured 1.57× faster fwd+bwd on v5e (scripts/exp_attn2.py). Padded
    queries need no explicit mask: padded g rows are zero, so dv/dp columns
    and ds columns vanish, which zeroes padded dq rows in turn (this holds
    for packed blocks too: p is finite everywhere, so 0·p stays 0).
    """
    d = qkv_ref.shape[2] // 3
    hd = d // num_heads
    R = num_heads * seq_pad
    n = q_len_ref[0]
    # Zero the OOB rows (see the forward kernel): padded g rows MUST read as
    # zero for the "padded queries need no explicit mask" property below.
    rowi = jax.lax.broadcasted_iota(jnp.int32, (seq_pad, 1), 0)
    qkv = jnp.where(rowi < n, qkv_ref[0], 0)  # (S_pad, 3D)
    g = jnp.where(rowi < n, g_ref[0], 0)  # (S_pad, D)
    q_all = (qkv[:, :d].astype(jnp.float32) * scale).astype(qkv.dtype)
    for h in range(num_heads):
        k = qkv[:, d + h * hd : d + (h + 1) * hd]
        st_ref[h * seq_pad : (h + 1) * seq_pad, :] = jax.lax.dot_general(
            k, q_all[:, h * hd : (h + 1) * hd],
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        )  # [h·S + j, i] = s_h[i, j]
    rowj = jax.lax.broadcasted_iota(jnp.int32, (R, seq_pad), 0)
    keyj = rowj % seq_pad
    valid = keyj < n
    if block_len < seq_pad:
        coli = jax.lax.broadcasted_iota(jnp.int32, (R, seq_pad), 1)
        valid &= (keyj // block_len) == (coli // block_len)
    st = jnp.where(valid, st_ref[:], NEG_INF)
    s3 = st.reshape(num_heads, seq_pad, seq_pad)
    m = jnp.max(s3, axis=1, keepdims=True)
    e = jnp.exp(s3 - m)
    l = jnp.sum(e, axis=1, keepdims=True)
    p = (e / l).reshape(R, seq_pad)  # f32
    for h in range(num_heads):
        v = qkv[:, 2 * d + h * hd : 2 * d + (h + 1) * hd]
        gh = g[:, h * hd : (h + 1) * hd]
        # dp[j, i] = sum_c v[j, c] g[i, c]
        dp_ref[h * seq_pad : (h + 1) * seq_pad, :] = jax.lax.dot_general(
            v, gh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # dv[j, c] = sum_i p[hS+j, i] g[i, c]
        dv = jax.lax.dot_general(
            p[h * seq_pad : (h + 1) * seq_pad, :].astype(gh.dtype), gh,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        dqkv_ref[0, :, 2 * d + h * hd : 2 * d + (h + 1) * hd] = dv.astype(
            dqkv_ref.dtype
        )
    dp3 = dp_ref[:].reshape(num_heads, seq_pad, seq_pad)
    p3 = p.reshape(num_heads, seq_pad, seq_pad)
    t3 = jnp.sum(p3 * dp3, axis=1, keepdims=True)
    # scale folded once here instead of into both dq and dk
    ds = ((p3 * (dp3 - t3) * scale).reshape(R, seq_pad)).astype(qkv.dtype)
    for h in range(num_heads):
        dsh = ds[h * seq_pad : (h + 1) * seq_pad, :]
        q = qkv[:, h * hd : (h + 1) * hd]
        k = qkv[:, d + h * hd : d + (h + 1) * hd]
        # dq[i, c] = sum_j ds[hS+j, i] k[j, c]
        dq = jax.lax.dot_general(
            dsh, k, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # dk[j, c] = sum_i ds[hS+j, i] q[i, c]
        dk = jax.lax.dot_general(
            dsh, q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dqkv_ref[0, :, h * hd : (h + 1) * hd] = dq.astype(dqkv_ref.dtype)
        dqkv_ref[0, :, d + h * hd : d + (h + 1) * hd] = dk.astype(
            dqkv_ref.dtype
        )


def _mha_qkv_backward(qkv, g, num_heads, scale, interpret, block_len=0):
    b, n, d3 = qkv.shape
    seq_pad = max(_cdiv(n, 128) * 128, 128)
    if not block_len:
        block_len = seq_pad
    # Implicit ragged-edge padding (see _mha_qkv_forward).
    lengths = jnp.full((1,), n, dtype=jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, seq_pad, d3), lambda i, lens: (i, 0, 0)),
            pl.BlockSpec((1, seq_pad, d3 // 3), lambda i, lens: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, seq_pad, d3), lambda i, lens: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((num_heads * seq_pad, seq_pad), jnp.float32),
            pltpu.VMEM((num_heads * seq_pad, seq_pad), jnp.float32),
        ],
    )
    dqkv = pl.pallas_call(
        functools.partial(
            _mha_qkv_bwd_kernel, num_heads=num_heads, seq_pad=seq_pad,
            scale=scale, block_len=block_len,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, n, d3), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=_WIDE_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(lengths, qkv, g)
    return dqkv


def _mha_qkv_kernel_saved(q_len_ref, qkv_ref, o_ref, p_out_ref, st_ref, *,
                          num_heads: int, seq_pad: int, scale: float,
                          block_len: int):
    """_mha_qkv_kernel that ALSO emits the softmax probabilities (bf16).

    Saving p lets the backward skip both the QK^T recompute (1 of its 5
    dots) and the entire masked-softmax VPU pass — the round-4 attention
    experiment (exp_attn4.py): trade ~0.4 ms/step of HBM p-traffic for
    that recompute. Identical math to the recompute path: p carries the
    key-padding and block-diagonal masks baked in."""
    d = qkv_ref.shape[2] // 3
    hd = d // num_heads
    R = num_heads * seq_pad
    n = q_len_ref[0]
    rowi = jax.lax.broadcasted_iota(jnp.int32, (seq_pad, 1), 0)
    qkv = jnp.where(rowi < n, qkv_ref[0], 0)  # (S_pad, 3D)
    q_all = (qkv[:, :d].astype(jnp.float32) * scale).astype(qkv.dtype)
    for h in range(num_heads):
        k = qkv[:, d + h * hd : d + (h + 1) * hd]
        st_ref[h * seq_pad : (h + 1) * seq_pad, :] = jax.lax.dot_general(
            k, q_all[:, h * hd : (h + 1) * hd],
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        )
    rowj = jax.lax.broadcasted_iota(jnp.int32, (R, seq_pad), 0)
    keyj = rowj % seq_pad
    valid = keyj < n
    if block_len < seq_pad:
        coli = jax.lax.broadcasted_iota(jnp.int32, (R, seq_pad), 1)
        valid &= (keyj // block_len) == (coli // block_len)
    st = jnp.where(valid, st_ref[:], NEG_INF)
    s3 = st.reshape(num_heads, seq_pad, seq_pad)
    m = jnp.max(s3, axis=1, keepdims=True)
    e = jnp.exp(s3 - m)
    l = jnp.sum(e, axis=1, keepdims=True)
    p = (e / l).reshape(R, seq_pad).astype(qkv.dtype)
    p_out_ref[0] = p
    for h in range(num_heads):
        v = qkv[:, 2 * d + h * hd : 2 * d + (h + 1) * hd]
        o = jax.lax.dot_general(
            p[h * seq_pad : (h + 1) * seq_pad, :], v,
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        o_ref[0, :, h * hd : h * hd + hd] = o.astype(o_ref.dtype)


def _mha_qkv_forward_saved(qkv, num_heads, scale, interpret, block_len=0):
    b, n, d3 = qkv.shape
    seq_pad = max(_cdiv(n, 128) * 128, 128)
    if not block_len:
        block_len = seq_pad
    R = num_heads * seq_pad
    lengths = jnp.full((1,), n, dtype=jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, seq_pad, d3), lambda i, lens: (i, 0, 0))],
        out_specs=[
            pl.BlockSpec((1, seq_pad, d3 // 3), lambda i, lens: (i, 0, 0)),
            pl.BlockSpec((1, R, seq_pad), lambda i, lens: (i, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((R, seq_pad), jnp.float32),
        ],
    )
    out, p = pl.pallas_call(
        functools.partial(
            _mha_qkv_kernel_saved, num_heads=num_heads, seq_pad=seq_pad,
            scale=scale, block_len=block_len,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, n, d3 // 3), qkv.dtype),
            jax.ShapeDtypeStruct((b, R, seq_pad), qkv.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=_WIDE_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(lengths, qkv)
    return out, p


def _mha_qkv_bwd_kernel_saved(q_len_ref, qkv_ref, g_ref, p_ref, dqkv_ref,
                              dp_ref, *, num_heads: int, seq_pad: int,
                              scale: float):
    """Backward from SAVED probabilities: no score dots, no softmax, no mask
    recompute (the saved p already encodes key padding and the packed
    block-diagonal). 4 dots per head instead of 5, and the backward's wide
    VPU pass shrinks to the ds expression."""
    d = qkv_ref.shape[2] // 3
    hd = d // num_heads
    R = num_heads * seq_pad
    n = q_len_ref[0]
    rowi = jax.lax.broadcasted_iota(jnp.int32, (seq_pad, 1), 0)
    qkv = jnp.where(rowi < n, qkv_ref[0], 0)  # (S_pad, 3D)
    # padded g rows MUST be zero: they null dp/dv columns for padded
    # queries (whose saved p is a real softmax row, not zero)
    g = jnp.where(rowi < n, g_ref[0], 0)  # (S_pad, D)
    p = p_ref[0]  # (R, S_pad), qkv dtype
    for h in range(num_heads):
        v = qkv[:, 2 * d + h * hd : 2 * d + (h + 1) * hd]
        gh = g[:, h * hd : (h + 1) * hd]
        dp_ref[h * seq_pad : (h + 1) * seq_pad, :] = jax.lax.dot_general(
            v, gh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dv = jax.lax.dot_general(
            p[h * seq_pad : (h + 1) * seq_pad, :], gh,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        dqkv_ref[0, :, 2 * d + h * hd : 2 * d + (h + 1) * hd] = dv.astype(
            dqkv_ref.dtype
        )
    dp3 = dp_ref[:].reshape(num_heads, seq_pad, seq_pad)
    p3 = p.astype(jnp.float32).reshape(num_heads, seq_pad, seq_pad)
    t3 = jnp.sum(p3 * dp3, axis=1, keepdims=True)
    ds = ((p3 * (dp3 - t3) * scale).reshape(R, seq_pad)).astype(qkv.dtype)
    for h in range(num_heads):
        dsh = ds[h * seq_pad : (h + 1) * seq_pad, :]
        q = qkv[:, h * hd : (h + 1) * hd]
        k = qkv[:, d + h * hd : d + (h + 1) * hd]
        dq = jax.lax.dot_general(
            dsh, k, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dk = jax.lax.dot_general(
            dsh, q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dqkv_ref[0, :, h * hd : (h + 1) * hd] = dq.astype(dqkv_ref.dtype)
        dqkv_ref[0, :, d + h * hd : d + (h + 1) * hd] = dk.astype(
            dqkv_ref.dtype
        )


def _mha_qkv_backward_saved(qkv, g, p, num_heads, scale, interpret):
    b, n, d3 = qkv.shape
    seq_pad = max(_cdiv(n, 128) * 128, 128)
    R = num_heads * seq_pad
    lengths = jnp.full((1,), n, dtype=jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, seq_pad, d3), lambda i, lens: (i, 0, 0)),
            pl.BlockSpec((1, seq_pad, d3 // 3), lambda i, lens: (i, 0, 0)),
            pl.BlockSpec((1, R, seq_pad), lambda i, lens: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, seq_pad, d3), lambda i, lens: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((R, seq_pad), jnp.float32),
        ],
    )
    dqkv = pl.pallas_call(
        functools.partial(
            _mha_qkv_bwd_kernel_saved, num_heads=num_heads, seq_pad=seq_pad,
            scale=scale,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, n, d3), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=_WIDE_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(lengths, qkv, g, p)
    return dqkv


def _mha_reference(qkv, num_heads, scale, block_len=0):
    b, n, d3 = qkv.shape
    d = d3 // 3
    hd = d // num_heads
    x = qkv.reshape(b, n, 3, num_heads, hd)
    q, k, v = x[:, :, 0], x[:, :, 1], x[:, :, 2]  # (B, N, H, hd)
    s = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if block_len and block_len < n:
        # Sequence-packed input: the "sequence" is a concatenation of
        # independent block_len-token sub-sequences (backbone-level packing,
        # models/vit.py) — mask cross-block attention.
        idx = jnp.arange(n) // block_len
        s = jnp.where(idx[:, None] == idx[None, :], s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum(
        "bhqk,bkhd->bqhd", p.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return o.reshape(b, n, d).astype(qkv.dtype)


# -- GSPMD integration: pallas_call is opaque to the partitioner, so the
# whole-sequence kernels are registered with custom_partitioning. Under a
# batch-sharded mesh axis each device lowers the kernel on its LOCAL batch
# shard (attention is independent per batch element — no cross-shard
# communication); seq/feature axes are required replicated. This is what
# lets the measured single-chip kernels ride unchanged under dp×tp meshes
# (reference keeps its cuDNN kernels under DDP, train.py:624-635).


@functools.partial(custom_partitioning, static_argnums=(1, 2, 3, 4))
def _mha_qkv_forward_p(qkv, num_heads, scale, interpret, block_len=0):
    return _mha_qkv_forward(qkv, num_heads, scale, interpret, block_len)


def _mha_fwd_infer(num_heads, scale, interpret, block_len, mesh, arg_shapes,
                   result_shape):
    return _keep_leading_spec(mesh, arg_shapes[0], 1)


def _mha_fwd_partition(num_heads, scale, interpret, block_len, mesh,
                       arg_shapes, result_shape):
    sh = _keep_leading_spec(mesh, arg_shapes[0], 1)

    def lower(qkv):
        return _mha_qkv_forward(qkv, num_heads, scale, interpret, block_len)

    return mesh, lower, sh, (sh,)


_mha_qkv_forward_p.def_partition(
    partition=_mha_fwd_partition,
    infer_sharding_from_operands=_mha_fwd_infer,
    sharding_rule="b s d -> b s e",
    need_replication_factors=("s", "d", "e"),
)


@functools.partial(custom_partitioning, static_argnums=(2, 3, 4, 5))
def _mha_qkv_backward_p(qkv, g, num_heads, scale, interpret, block_len=0):
    return _mha_qkv_backward(qkv, g, num_heads, scale, interpret, block_len)


def _mha_bwd_infer(num_heads, scale, interpret, block_len, mesh, arg_shapes,
                   result_shape):
    return _keep_leading_spec(mesh, arg_shapes[0], 1)


def _mha_bwd_partition(num_heads, scale, interpret, block_len, mesh,
                       arg_shapes, result_shape):
    qkv_sh = _keep_leading_spec(mesh, arg_shapes[0], 1)
    g_sh = _keep_leading_spec(mesh, arg_shapes[1], 1)

    def lower(qkv, g):
        return _mha_qkv_backward(qkv, g, num_heads, scale, interpret,
                                 block_len)

    return mesh, lower, qkv_sh, (qkv_sh, g_sh)


_mha_qkv_backward_p.def_partition(
    partition=_mha_bwd_partition,
    infer_sharding_from_operands=_mha_bwd_infer,
    sharding_rule="b s d, b s e -> b s d",
    need_replication_factors=("s", "d", "e"),
)


@functools.partial(custom_partitioning, static_argnums=(1, 2, 3, 4))
def _mha_qkv_forward_saved_p(qkv, num_heads, scale, interpret, block_len=0):
    return _mha_qkv_forward_saved(qkv, num_heads, scale, interpret, block_len)


def _mha_fwd_saved_infer(num_heads, scale, interpret, block_len, mesh,
                         arg_shapes, result_shape):
    sh = _keep_leading_spec(mesh, arg_shapes[0], 1)
    return (sh, sh)


def _mha_fwd_saved_partition(num_heads, scale, interpret, block_len, mesh,
                             arg_shapes, result_shape):
    sh = _keep_leading_spec(mesh, arg_shapes[0], 1)

    def lower(qkv):
        return _mha_qkv_forward_saved(qkv, num_heads, scale, interpret,
                                      block_len)

    return mesh, lower, (sh, sh), (sh,)


_mha_qkv_forward_saved_p.def_partition(
    partition=_mha_fwd_saved_partition,
    infer_sharding_from_operands=_mha_fwd_saved_infer,
    sharding_rule="b s d -> b s e, b r t",
    need_replication_factors=("s", "d", "e", "r", "t"),
)


@functools.partial(custom_partitioning, static_argnums=(3, 4, 5))
def _mha_qkv_backward_saved_p(qkv, g, p, num_heads, scale, interpret):
    return _mha_qkv_backward_saved(qkv, g, p, num_heads, scale, interpret)


def _mha_bwd_saved_infer(num_heads, scale, interpret, mesh, arg_shapes,
                         result_shape):
    return _keep_leading_spec(mesh, arg_shapes[0], 1)


def _mha_bwd_saved_partition(num_heads, scale, interpret, mesh, arg_shapes,
                             result_shape):
    shs = tuple(_keep_leading_spec(mesh, a, 1) for a in arg_shapes)

    def lower(qkv, g, p):
        return _mha_qkv_backward_saved(qkv, g, p, num_heads, scale, interpret)

    return mesh, lower, shs[0], shs


_mha_qkv_backward_saved_p.def_partition(
    partition=_mha_bwd_saved_partition,
    infer_sharding_from_operands=_mha_bwd_saved_infer,
    sharding_rule="b s d, b s e, b r t -> b s d",
    need_replication_factors=("s", "d", "e", "r", "t"),
)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def _mha_qkv_saved(qkv, num_heads, scale, interpret, block_len=0):
    out, _ = _mha_qkv_forward_saved_p(qkv, num_heads, scale, interpret,
                                      block_len)
    return out


def _mha_qkv_saved_fwd(qkv, num_heads, scale, interpret, block_len):
    out, p = _mha_qkv_forward_saved_p(qkv, num_heads, scale, interpret,
                                      block_len)
    return out, (qkv, p)


def _mha_qkv_saved_bwd(num_heads, scale, interpret, block_len, res, g):
    qkv, p = res
    # block_len is baked into the saved p (block-diagonal support) — the
    # backward needs no mask at all.
    return (
        _mha_qkv_backward_saved_p(qkv, g, p, num_heads, scale, interpret),
    )


_mha_qkv_saved.defvjp(_mha_qkv_saved_fwd, _mha_qkv_saved_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def _mha_qkv(qkv, num_heads, scale, interpret, block_len=0):
    return _mha_qkv_forward_p(qkv, num_heads, scale, interpret, block_len)


def _mha_qkv_fwd(qkv, num_heads, scale, interpret, block_len):
    return (
        _mha_qkv_forward_p(qkv, num_heads, scale, interpret, block_len),
        (qkv,),
    )


def _mha_qkv_bwd(num_heads, scale, interpret, block_len, res, g):
    (qkv,) = res
    # Analytic Pallas backward (flash-style: only qkv saved, p recomputed).
    return (
        _mha_qkv_backward_p(qkv, g, num_heads, scale, interpret, block_len),
    )


_mha_qkv.defvjp(_mha_qkv_fwd, _mha_qkv_bwd)


def mha_from_qkv(
    qkv: jax.Array,
    num_heads: int,
    scale: float | None = None,
    interpret: bool | None = None,
    training: bool = False,
    block_len: int = 0,
    save_probs: bool = False,
) -> jax.Array:
    """Multi-head attention directly from the fused qkv projection output.

    qkv: (B, N, 3·D) with columns laid out [which(3), head, head_dim]
    (i.e. the natural Dense(3D) output reshaped as (..., 3, H, hd)).
    Returns (B, N, D). Pallas whole-sequence kernel on TPU for ViT-length
    sequences; XLA reference elsewhere.

    Multi-chip: the kernels are registered with custom_partitioning (batch
    axis shardable, per-device local lowering), so they ride unchanged under
    dp×tp meshes; the 37-token local-crop and non-TPU paths are plain XLA
    and partition freely.
    """
    d = qkv.shape[-1] // 3
    if scale is None:
        scale = (d // num_heads) ** -0.5
    if block_len and block_len < qkv.shape[1]:
        # Pre-packed input (backbone-level sequence packing, models/vit.py):
        # the sequence axis is pack independent block_len-token sub-sequences
        # already laid out contiguously — run the wide kernel with the
        # block-diagonal mask directly, no reshapes here. Packing at the
        # TOKEN level once (D-wide) instead of per-attention-call (3D-wide,
        # twice per layer) removed ~6 ms/step of tiled-layout relayout
        # copies from the DINO step (round-3 trace: copy.2557/reshape.542).
        b, n = qkv.shape[0], qkv.shape[1]
        seq_pad = max(_cdiv(n, 128) * 128, 128)
        if (
            jax.default_backend() == "tpu"
            and _wide_vmem_ok(num_heads, seq_pad, d, qkv.dtype.itemsize)
        ) or interpret:
            op = _mha_qkv_saved if (save_probs and training) else _mha_qkv
            return op(qkv, num_heads, scale, bool(interpret), block_len)
        return _mha_reference(qkv, num_heads, scale, block_len)
    # Measured on v5e (scripts/exp_attn2.py): the wide-softmax kernel is 1.6×
    # XLA fwd at 197 tokens and 1.25× fwd+bwd; below ~64 tokens the 128-row
    # padding makes XLA win the FORWARD (0.29 vs 0.81 ms at 576×37) but the
    # kernel still wins fwd+bwd (1.62 vs 1.79 ms) because XLA's attention
    # backward is weak — so training forwards (student local crops) dispatch
    # to the kernel at any length, inference forwards only at ≥64 tokens.
    # Past the VMEM budget the whole-sequence block cannot compile (the
    # backward holds two (H·S_pad, S_pad) f32 scratches) — use the O(S)
    # flash kernel (fused_attention) there instead.
    min_seq = 2 if training else 64
    b, n = qkv.shape[0], qkv.shape[1]
    seq_pad = max(_cdiv(n, 128) * 128, 128)
    use_pallas = (
        jax.default_backend() == "tpu"
        and min_seq <= n
        and _wide_vmem_ok(num_heads, seq_pad, d, qkv.dtype.itemsize)
    ) or interpret
    if not use_pallas:
        if jax.default_backend() == "tpu" and n >= MIN_PALLAS_SEQ:
            # Over the wide-kernel VMEM budget (e.g. ViT-S at 448 px → 785
            # tokens): unpack the fused qkv and run the flash kernel, which
            # tiles the sequence and never materializes (S, S).
            hd = d // num_heads
            x = qkv.reshape(b, n, 3, num_heads, hd).transpose(2, 0, 3, 1, 4)
            o = fused_attention(x[0], x[1], x[2], scale=scale,
                                interpret=interpret)
            return o.transpose(0, 2, 1, 3).reshape(b, n, d)
        return _mha_reference(qkv, num_heads, scale)
    pack = 128 // n if n <= 64 else 1
    if pack > 1:
        # Sequence packing: 37-token local crops pad to 128 rows, wasting
        # ~91% of every score tile. Stack `pack` batch elements along the
        # sequence axis (row-major reshape keeps each element contiguous)
        # and run the kernel with a block-diagonal mask — `pack`× fewer
        # programs for the same per-program cost. The pad/reshape/slice sit
        # OUTSIDE custom_vjp, so XLA autodiff routes cotangents through
        # them automatically.
        b_pad = _cdiv(b, pack) * pack
        if b_pad != b:
            qkv = jnp.pad(qkv, ((0, b_pad - b), (0, 0), (0, 0)))
        packed = qkv.reshape(b_pad // pack, pack * n, qkv.shape[-1])
        op = _mha_qkv_saved if (save_probs and training) else _mha_qkv
        out = op(packed, num_heads, scale, bool(interpret), n)
        return out.reshape(b_pad, n, d)[:b]
    op = _mha_qkv_saved if (save_probs and training) else _mha_qkv
    return op(qkv, num_heads, scale, bool(interpret))


def fused_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    kv_lengths: jax.Array | None = None,
    scale: float | None = None,
    tile_q: int = 128,
    tile_k: int = 128,
    interpret: bool | None = None,
    force_pallas: bool = False,
) -> jax.Array:
    """Fused attention with a measured dispatch heuristic.

    - Long sequences (>= MIN_PALLAS_SEQ keys: MIL bags, full-slide
      transformers) → Pallas flash kernel: O(S) memory, online softmax.
    - Short ViT sequences (197-257 tokens) → XLA attention: measured FASTER
      on v5e than the blockwise kernel at these sizes (33.9 ms vs 49.4 ms for
      128×224² ViT-S forwards — the S² matrix fits easily and XLA's fusion
      wins; flash blocking only pays past ~512 tokens).
    - Non-TPU backends → XLA reference.

    Args:
      q, k, v: (B, H, S, D)
      kv_lengths: optional (B,) int — true key count per batch element
        (padded keys are masked out). Only supported on the inference path
        (no gradient through masked attention needed by any reference config).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    backend = jax.default_backend()
    long_seq = k.shape[2] >= MIN_PALLAS_SEQ
    use_pallas = (backend == "tpu" and (long_seq or force_pallas)) or interpret
    if not use_pallas:
        return attention_reference(q, k, v, kv_lengths, scale)
    if kv_lengths is not None:
        return _flash_forward_masked_p(
            q, k, v, kv_lengths.astype(jnp.int32), scale, tile_q, tile_k,
            bool(interpret)
        )
    return _fused_attention(q, k, v, scale, tile_q, tile_k, bool(interpret))


# ---------------------------------------------------------------------------
# Fused pre-norm ATTENTION block:
#   y = x + ( WideSoftmaxMHA( LN(x) @ Wqkv + bqkv ) @ Wproj + bproj )
#
# Same rationale as ops/mlp.fused_mlp_block: per-op boundaries (custom-call
# edge copies, DMA prologues) dominate over bytes in the profiled step, so
# the entire pre-norm attention sub-block becomes ONE op. The attention core
# repeats the wide-softmax math of _mha_qkv_kernel (kept self-contained —
# kernel code over clever sharing); sequence packing (block_len < seq_pad)
# works unchanged because LN/GEMM/residual are row-local.
# ---------------------------------------------------------------------------


def _ln_rows(xf, g, be, eps):
    mu = jnp.mean(xf, axis=1, keepdims=True)
    var = jnp.mean(xf * xf, axis=1, keepdims=True) - mu * mu
    inv = jax.lax.rsqrt(jnp.maximum(var, 0.0) + eps)
    uhat = (xf - mu) * inv
    return uhat * g + be, uhat, inv


def _wide_attn_fwd(qkv, n, num_heads, seq_pad, block_len, scale, st_ref):
    """Wide-softmax MHA on a (S_pad, 3D) qkv block; returns o (S_pad, D) f32
    accumulated per head into bf16-compatible slices. Mirrors
    _mha_qkv_kernel's measured structure."""
    d = qkv.shape[1] // 3
    hd = d // num_heads
    R = num_heads * seq_pad
    q_all = (qkv[:, :d].astype(jnp.float32) * scale).astype(qkv.dtype)
    for h in range(num_heads):
        k = qkv[:, d + h * hd : d + (h + 1) * hd]
        st_ref[h * seq_pad : (h + 1) * seq_pad, :] = jax.lax.dot_general(
            k, q_all[:, h * hd : (h + 1) * hd],
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        )
    rowj = jax.lax.broadcasted_iota(jnp.int32, (R, seq_pad), 0)
    keyj = rowj % seq_pad
    valid = keyj < n
    if block_len < seq_pad:
        coli = jax.lax.broadcasted_iota(jnp.int32, (R, seq_pad), 1)
        valid &= (keyj // block_len) == (coli // block_len)
    st = jnp.where(valid, st_ref[:], NEG_INF)
    s3 = st.reshape(num_heads, seq_pad, seq_pad)
    m = jnp.max(s3, axis=1, keepdims=True)
    e = jnp.exp(s3 - m)
    l = jnp.sum(e, axis=1, keepdims=True)
    p = (e / l).reshape(R, seq_pad).astype(qkv.dtype)
    outs = []
    for h in range(num_heads):
        v = qkv[:, 2 * d + h * hd : 2 * d + (h + 1) * hd]
        outs.append(jax.lax.dot_general(
            p[h * seq_pad : (h + 1) * seq_pad, :], v,
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ))
    return jnp.concatenate(outs, axis=1)  # (S_pad, D) f32


def _wide_attn_bwd(qkv, g, n, num_heads, seq_pad, block_len, scale,
                   st_ref, dp_ref):
    """dqkv for the wide-softmax MHA (mirrors _mha_qkv_bwd_kernel).
    qkv/g: (S_pad, 3D)/(S_pad, D) with OOB rows already zeroed."""
    d = qkv.shape[1] // 3
    hd = d // num_heads
    R = num_heads * seq_pad
    q_all = (qkv[:, :d].astype(jnp.float32) * scale).astype(qkv.dtype)
    for h in range(num_heads):
        k = qkv[:, d + h * hd : d + (h + 1) * hd]
        st_ref[h * seq_pad : (h + 1) * seq_pad, :] = jax.lax.dot_general(
            k, q_all[:, h * hd : (h + 1) * hd],
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        )
    rowj = jax.lax.broadcasted_iota(jnp.int32, (R, seq_pad), 0)
    keyj = rowj % seq_pad
    valid = keyj < n
    if block_len < seq_pad:
        coli = jax.lax.broadcasted_iota(jnp.int32, (R, seq_pad), 1)
        valid &= (keyj // block_len) == (coli // block_len)
    st = jnp.where(valid, st_ref[:], NEG_INF)
    s3 = st.reshape(num_heads, seq_pad, seq_pad)
    m = jnp.max(s3, axis=1, keepdims=True)
    e = jnp.exp(s3 - m)
    l = jnp.sum(e, axis=1, keepdims=True)
    p = (e / l).reshape(R, seq_pad)  # f32
    dvs = []
    for h in range(num_heads):
        v = qkv[:, 2 * d + h * hd : 2 * d + (h + 1) * hd]
        gh = g[:, h * hd : (h + 1) * hd]
        dp_ref[h * seq_pad : (h + 1) * seq_pad, :] = jax.lax.dot_general(
            v, gh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dvs.append(jax.lax.dot_general(
            p[h * seq_pad : (h + 1) * seq_pad, :].astype(gh.dtype), gh,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ))
    dp3 = dp_ref[:].reshape(num_heads, seq_pad, seq_pad)
    p3 = p.reshape(num_heads, seq_pad, seq_pad)
    t3 = jnp.sum(p3 * dp3, axis=1, keepdims=True)
    ds = ((p3 * (dp3 - t3) * scale).reshape(R, seq_pad)).astype(qkv.dtype)
    dqs, dks = [], []
    for h in range(num_heads):
        dsh = ds[h * seq_pad : (h + 1) * seq_pad, :]
        q = qkv[:, h * hd : (h + 1) * hd]
        k = qkv[:, d + h * hd : d + (h + 1) * hd]
        dqs.append(jax.lax.dot_general(
            dsh, k, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))
        dks.append(jax.lax.dot_general(
            dsh, q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))
    return jnp.concatenate(
        [jnp.concatenate(dqs, axis=1), jnp.concatenate(dks, axis=1),
         jnp.concatenate(dvs, axis=1)], axis=1,
    )  # (S_pad, 3D) f32


def _attn_block_fwd_kernel(len_ref, x_ref, g_ref, be_ref, wqkv_ref, bqkv_ref,
                           wp_ref, bp_ref, y_ref, st_ref, *, num_heads: int,
                           seq_pad: int, scale: float, block_len: int,
                           eps: float):
    n = len_ref[0]
    rowi = jax.lax.broadcasted_iota(jnp.int32, (seq_pad, 1), 0)
    x = jnp.where(rowi < n, x_ref[0], 0)
    xf = x.astype(jnp.float32)
    ln, _, _ = _ln_rows(xf, g_ref[...].astype(jnp.float32),
                        be_ref[...].astype(jnp.float32), eps)
    lnc = ln.astype(x.dtype)
    qkv = (jax.lax.dot_general(
        lnc, wqkv_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bqkv_ref[...].astype(jnp.float32)).astype(x.dtype)
    o = _wide_attn_fwd(qkv, n, num_heads, seq_pad, block_len, scale, st_ref)
    y = jax.lax.dot_general(
        o.astype(x.dtype), wp_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bp_ref[...].astype(jnp.float32)
    y_ref[0] = x + y.astype(y_ref.dtype)


def _attn_block_bwd_kernel(len_ref, x_ref, dy_ref, g_ref, be_ref, wqkv_ref,
                           bqkv_ref, wp_ref, dx_ref,
                           dg_ref, dbe_ref, dwqkv_ref, dbqkv_ref, dwp_ref,
                           dbp_ref,
                           st_ref, dp_ref, dwqkv_s, dwp_s, dbqkv_s, dbp_s,
                           dg_s, dbe_s, *, num_heads: int, seq_pad: int,
                           scale: float, block_len: int, eps: float):
    i = pl.program_id(0)
    nprog = pl.num_programs(0)

    @pl.when(i == 0)
    def _init():
        dwqkv_s[:] = jnp.zeros_like(dwqkv_s)
        dwp_s[:] = jnp.zeros_like(dwp_s)
        dbqkv_s[:] = jnp.zeros_like(dbqkv_s)
        dbp_s[:] = jnp.zeros_like(dbp_s)
        dg_s[:] = jnp.zeros_like(dg_s)
        dbe_s[:] = jnp.zeros_like(dbe_s)

    n = len_ref[0]
    rowi = jax.lax.broadcasted_iota(jnp.int32, (seq_pad, 1), 0)
    x = jnp.where(rowi < n, x_ref[0], 0)
    dy = jnp.where(rowi < n, dy_ref[0], 0)
    xf = x.astype(jnp.float32)
    gam = g_ref[...].astype(jnp.float32)
    ln, uhat, inv = _ln_rows(xf, gam, be_ref[...].astype(jnp.float32), eps)
    lnc = ln.astype(x.dtype)
    qkv = (jax.lax.dot_general(
        lnc, wqkv_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bqkv_ref[...].astype(jnp.float32)).astype(x.dtype)
    # recompute o for dWp
    o = _wide_attn_fwd(
        qkv, n, num_heads, seq_pad, block_len, scale, st_ref
    ).astype(x.dtype)
    dyf = dy.astype(jnp.float32)
    # proj backward
    dwp_s[:] += jax.lax.dot_general(
        o, dy, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dbp_s[:] += jnp.sum(dyf, axis=0, keepdims=True)
    do_attn = jax.lax.dot_general(
        dy, wp_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    # attention backward (recomputes p internally)
    dqkv = _wide_attn_bwd(
        qkv, do_attn, n, num_heads, seq_pad, block_len, scale, st_ref, dp_ref
    )
    dqkv_c = dqkv.astype(x.dtype)
    # qkv GEMM backward
    dwqkv_s[:] += jax.lax.dot_general(
        lnc, dqkv_c, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dbqkv_s[:] += jnp.sum(dqkv, axis=0, keepdims=True)
    dln = jax.lax.dot_general(
        dqkv_c, wqkv_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # LayerNorm backward + residual
    dxhat = dln * gam
    m1 = jnp.mean(dxhat, axis=1, keepdims=True)
    m2 = jnp.mean(dxhat * uhat, axis=1, keepdims=True)
    dx_ln = inv * (dxhat - m1 - uhat * m2)
    dx_ref[0] = (dyf + dx_ln).astype(dx_ref.dtype)
    dg_s[:] += jnp.sum(dln * uhat, axis=0, keepdims=True)
    dbe_s[:] += jnp.sum(dln, axis=0, keepdims=True)

    @pl.when(i == nprog - 1)
    def _fin():
        dwqkv_ref[...] = dwqkv_s[:].astype(dwqkv_ref.dtype)
        dwp_ref[...] = dwp_s[:].astype(dwp_ref.dtype)
        dbqkv_ref[...] = dbqkv_s[:].astype(dbqkv_ref.dtype)
        dbp_ref[...] = dbp_s[:].astype(dbp_ref.dtype)
        dg_ref[...] = dg_s[:].astype(dg_ref.dtype)
        dbe_ref[...] = dbe_s[:].astype(dbe_ref.dtype)


def _attn_block_forward(x, g, be, wqkv, bqkv, wp, bp, num_heads, scale,
                        block_len, eps, interpret):
    b, n, d = x.shape
    seq_pad = max(_cdiv(n, 128) * 128, 128)
    if not block_len:
        block_len = seq_pad
    lengths = jnp.full((1,), n, dtype=jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, seq_pad, d), lambda i, lens: (i, 0, 0)),
            pl.BlockSpec((1, d), lambda i, lens: (0, 0)),
            pl.BlockSpec((1, d), lambda i, lens: (0, 0)),
            pl.BlockSpec((d, 3 * d), lambda i, lens: (0, 0)),
            pl.BlockSpec((1, 3 * d), lambda i, lens: (0, 0)),
            pl.BlockSpec((d, d), lambda i, lens: (0, 0)),
            pl.BlockSpec((1, d), lambda i, lens: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, seq_pad, d), lambda i, lens: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((num_heads * seq_pad, seq_pad), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(
            _attn_block_fwd_kernel, num_heads=num_heads, seq_pad=seq_pad,
            scale=scale, block_len=block_len, eps=eps,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(lengths, x, g.reshape(1, d), be.reshape(1, d), wqkv,
      bqkv.reshape(1, 3 * d), wp, bp.reshape(1, d))


def _attn_block_backward(x, dy, g, be, wqkv, bqkv, wp, num_heads, scale,
                         block_len, eps, interpret):
    b, n, d = x.shape
    seq_pad = max(_cdiv(n, 128) * 128, 128)
    if not block_len:
        block_len = seq_pad
    lengths = jnp.full((1,), n, dtype=jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, seq_pad, d), lambda i, lens: (i, 0, 0)),
            pl.BlockSpec((1, seq_pad, d), lambda i, lens: (i, 0, 0)),
            pl.BlockSpec((1, d), lambda i, lens: (0, 0)),
            pl.BlockSpec((1, d), lambda i, lens: (0, 0)),
            pl.BlockSpec((d, 3 * d), lambda i, lens: (0, 0)),
            pl.BlockSpec((1, 3 * d), lambda i, lens: (0, 0)),
            pl.BlockSpec((d, d), lambda i, lens: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, seq_pad, d), lambda i, lens: (i, 0, 0)),
            pl.BlockSpec((1, d), lambda i, lens: (0, 0)),
            pl.BlockSpec((1, d), lambda i, lens: (0, 0)),
            pl.BlockSpec((d, 3 * d), lambda i, lens: (0, 0)),
            pl.BlockSpec((1, 3 * d), lambda i, lens: (0, 0)),
            pl.BlockSpec((d, d), lambda i, lens: (0, 0)),
            pl.BlockSpec((1, d), lambda i, lens: (0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((num_heads * seq_pad, seq_pad), jnp.float32),
            pltpu.VMEM((num_heads * seq_pad, seq_pad), jnp.float32),
            pltpu.VMEM((d, 3 * d), jnp.float32),
            pltpu.VMEM((d, d), jnp.float32),
            pltpu.VMEM((1, 3 * d), jnp.float32),
            pltpu.VMEM((1, d), jnp.float32),
            pltpu.VMEM((1, d), jnp.float32),
            pltpu.VMEM((1, d), jnp.float32),
        ],
    )
    outs = pl.pallas_call(
        functools.partial(
            _attn_block_bwd_kernel, num_heads=num_heads, seq_pad=seq_pad,
            scale=scale, block_len=block_len, eps=eps,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, n, d), x.dtype),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((d, 3 * d), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * d), jnp.float32),
            jax.ShapeDtypeStruct((d, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=int(3e7),
        ),
        interpret=interpret,
    )(lengths, x, dy, g.reshape(1, d), be.reshape(1, d), wqkv,
      bqkv.reshape(1, 3 * d), wp)
    dx, dg, dbe, dwqkv, dbqkv, dwp, dbp = outs
    return (dx, dg.reshape(d), dbe.reshape(d), dwqkv,
            dbqkv.reshape(3 * d), dwp, dbp.reshape(d))


@functools.partial(custom_partitioning, static_argnums=(7, 8, 9, 10, 11))
def _attn_block_forward_p(x, g, be, wqkv, bqkv, wp, bp, num_heads, scale,
                          block_len, eps, interpret):
    return _attn_block_forward(x, g, be, wqkv, bqkv, wp, bp, num_heads,
                               scale, block_len, eps, interpret)


def _ab_fwd_infer(num_heads, scale, block_len, eps, interpret, mesh,
                  arg_shapes, result_shape):
    return _keep_leading_spec(mesh, arg_shapes[0], 1)


def _ab_fwd_partition(num_heads, scale, block_len, eps, interpret, mesh,
                      arg_shapes, result_shape):
    x_sh = _keep_leading_spec(mesh, arg_shapes[0], 1)
    reps = tuple(
        NamedSharding(mesh, P(*([None] * len(a.shape))))
        for a in arg_shapes[1:]
    )

    def lower(x, g, be, wqkv, bqkv, wp, bp):
        return _attn_block_forward(x, g, be, wqkv, bqkv, wp, bp, num_heads,
                                   scale, block_len, eps, interpret)

    return mesh, lower, x_sh, (x_sh,) + reps


_attn_block_forward_p.def_partition(
    partition=_ab_fwd_partition,
    infer_sharding_from_operands=_ab_fwd_infer,
    sharding_rule="b s d, d, d, d q, q, d e, e -> b s d",
    need_replication_factors=("s", "d", "q", "e"),
)


@functools.partial(custom_partitioning, static_argnums=(7, 8, 9, 10, 11))
def _attn_block_backward_p(x, dy, g, be, wqkv, bqkv, wp, num_heads, scale,
                           block_len, eps, interpret):
    return _attn_block_backward(x, dy, g, be, wqkv, bqkv, wp, num_heads,
                                scale, block_len, eps, interpret)


def _ab_bwd_infer(num_heads, scale, block_len, eps, interpret, mesh,
                  arg_shapes, result_shape):
    # outputs: dx, dg, dbe, dwqkv, dbqkv, dwp, dbp — one more than the
    # non-x inputs (dbp has no bproj operand in the backward's args)
    x_sh = _keep_leading_spec(mesh, arg_shapes[0], 1)
    reps = tuple(
        NamedSharding(mesh, P(*([None] * len(a.shape))))
        for a in arg_shapes[2:]
    )
    rep1 = NamedSharding(mesh, P(None))
    return (x_sh,) + reps + (rep1,)


def _ab_bwd_partition(num_heads, scale, block_len, eps, interpret, mesh,
                      arg_shapes, result_shape):
    outs = _ab_bwd_infer(num_heads, scale, block_len, eps, interpret, mesh,
                         arg_shapes, result_shape)
    x_sh = outs[0]
    in_reps = tuple(
        NamedSharding(mesh, P(*([None] * len(a.shape))))
        for a in arg_shapes[2:]
    )
    spec0 = arg_shapes[0].sharding.spec
    s0 = spec0[0] if spec0 else None
    psum_axes = (tuple(s0) if isinstance(s0, tuple) else (s0,)) if s0 else ()

    def lower(x, dy, g, be, wqkv, bqkv, wp):
        res = _attn_block_backward(x, dy, g, be, wqkv, bqkv, wp, num_heads,
                                   scale, block_len, eps, interpret)
        if psum_axes:
            dx = res[0]
            rest = tuple(jax.lax.psum(t, psum_axes) for t in res[1:])
            return (dx,) + rest
        return res

    return mesh, lower, outs, (x_sh, x_sh) + in_reps


_attn_block_backward_p.def_partition(
    partition=_ab_bwd_partition,
    infer_sharding_from_operands=_ab_bwd_infer,
    sharding_rule=(
        "b s d, b s e, d, d, d q, q, d e "
        "-> b s d, d, d, d q, q, d e, e"
    ),
    need_replication_factors=("s", "d", "e", "q"),
)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11))
def _fused_attn_block(x, g, be, wqkv, bqkv, wp, bp, num_heads, scale,
                      block_len, eps, interpret):
    return _attn_block_forward_p(x, g, be, wqkv, bqkv, wp, bp, num_heads,
                                 scale, block_len, eps, interpret)


def _fused_attn_block_fwd(x, g, be, wqkv, bqkv, wp, bp, num_heads, scale,
                          block_len, eps, interpret):
    y = _attn_block_forward_p(x, g, be, wqkv, bqkv, wp, bp, num_heads,
                              scale, block_len, eps, interpret)
    return y, (x, g, be, wqkv, bqkv, wp)


def _fused_attn_block_bwd(num_heads, scale, block_len, eps, interpret, res,
                          dy):
    x, g, be, wqkv, bqkv, wp = res
    dx, dg, dbe, dwqkv, dbqkv, dwp, dbp = _attn_block_backward_p(
        x, dy, g, be, wqkv, bqkv, wp, num_heads, scale, block_len, eps,
        interpret,
    )
    return (
        dx,
        dg.astype(g.dtype),
        dbe.astype(be.dtype),
        dwqkv.astype(wqkv.dtype),
        dbqkv.astype(wqkv.dtype),
        dwp.astype(wp.dtype),
        dbp.astype(wp.dtype),
    )


_fused_attn_block.defvjp(_fused_attn_block_fwd, _fused_attn_block_bwd)


def fused_attention_block(
    x: jax.Array,
    ln_scale: jax.Array,
    ln_bias: jax.Array,
    wqkv: jax.Array,
    bqkv: jax.Array,
    wproj: jax.Array,
    bproj: jax.Array,
    num_heads: int,
    *,
    eps: float = 1e-6,
    interpret: bool | None = None,
) -> jax.Array:
    """Pre-norm attention sub-block as ONE TPU op:
    y = x + (WideSoftmaxMHA(LN(x) @ Wqkv + bqkv) @ Wproj + bproj).

    x: (B, N, D) residual stream. Short sequences (N ≤ 64) are
    sequence-packed 128//N per program with a block-diagonal mask, exactly
    like mha_from_qkv. On non-TPU backends (without interpret) the op
    transparently computes and returns the XLA reference result — callers
    never need to branch.
    """
    b, n, d = x.shape
    scale = (d // num_heads) ** -0.5
    dt = x.dtype
    if jax.default_backend() != "tpu" and not interpret:
        # XLA fallback (CPU test mesh without interpret mode)
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
        ln = ((xf - mu) * jax.lax.rsqrt(jnp.maximum(var, 0.0) + eps)
              * ln_scale + ln_bias).astype(dt)
        qkv = ln @ wqkv.astype(dt) + bqkv.astype(dt)
        o = _mha_reference(qkv, num_heads, scale)
        return x + (o @ wproj.astype(dt) + bproj.astype(dt)).astype(dt)
    args = (ln_scale.astype(jnp.float32), ln_bias.astype(jnp.float32),
            wqkv.astype(dt), bqkv.astype(dt), wproj.astype(dt),
            bproj.astype(dt))
    pack = 128 // n if n <= 64 else 1
    if pack > 1:
        b_pad = _cdiv(b, pack) * pack
        if b_pad != b:
            x = jnp.pad(x, ((0, b_pad - b), (0, 0), (0, 0)))
        packed = x.reshape(b_pad // pack, pack * n, d)
        out = _fused_attn_block(packed, *args, num_heads, scale, n,
                                float(eps), bool(interpret))
        return out.reshape(b_pad, n, d)[:b]
    return _fused_attn_block(x, *args, num_heads, scale, 0, float(eps),
                             bool(interpret))
