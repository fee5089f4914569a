"""Vision Transformer, TPU-first.

Parity target: the reference's timm ViTs (created at train.py:482-495 via
``create_model('vit_small_patch16_224_dino', ...)``) and the orphaned DINO
``VisionTransformer`` recovered from bytecode at
nn_encoder_arch/__pycache__/vision_transformer.cpython-37.pyc (symbols:
trunc_normal_, DropPath, Mlp, Attention, Block, PatchEmbed, VisionTransformer
with interpolate_pos_encoding / prepare_tokens / get_last_selfattention /
get_intermediate_layers, factories vit_tiny/vit_small/vit_base) — see
SURVEY.md §2.9.

TPU-first choices (not a torch port):
- NHWC everywhere; patch-embed is a space-to-depth reshape + one GEMM (maps
  straight onto the MXU instead of an im2col conv).
- Fused attention via the Pallas flash kernel (tpuwsi.ops.attention).
- bf16 compute / fp32 params via the precision policy; LayerNorm in fp32.
- Stochastic depth and dropout are driven by explicit flax RNG collections.
- geometry: ViT-S embed dim 384 (confirmed by the reference's 384-dim feature
  export, train.py:1203).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpuwsi.ops.attention import attention_reference, fused_attention, mha_from_qkv

Dtype = Any


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    img_size: int = 224
    patch_size: int = 16
    in_chans: int = 3
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    num_classes: int = 0  # 0 → no head (feature extractor)
    dtype: Dtype = jnp.bfloat16
    # LayerNorm compute dtype. fp32 is the safe default; bf16 halves the
    # elementwise HBM traffic of the residual stream (A/B via bench).
    ln_dtype: Dtype = jnp.float32
    # jax.checkpoint each transformer block: trades ~1/3 more FLOPs in the
    # backward for O(depth) less activation memory — lets bigger batches fit
    # HBM (BASELINE headroom item: batch-128 regression).
    remat_blocks: bool = False
    # Rematerialization policy when remat_blocks=True: a name from
    # jax.checkpoint_policies ("dots_saveable",
    # "dots_with_no_batch_dims_saveable", ...), None for full recompute, or
    # "auto" (default) for the historical per-stack choice: full recompute
    # on the unrolled stack, dots_with_no_batch_dims_saveable inside scan
    # (where full recompute re-runs every Pallas attention forward in the
    # backward of EVERY layer). Beyond memory, the policy restructures
    # WHICH ops the backward recomputes adjacent to the gradient GEMMs —
    # i.e. which backward fusions XLA can form (exp_remat4.py A/Bs this
    # against the 56-79%-MFU dgrad+wgrad+dbias MOFs named in BENCH.md).
    remat_policy: Optional[str] = "auto"
    use_pallas_attention: bool = True
    # Pallas fused MLP / fused pre-norm MLP block (ops/mlp.py). Separate
    # toggle from attention so the two kernel families can be A/B'd
    # independently on the full step (scripts/exp_kernels3.py). Default off:
    # the round-3 re-A/B (BENCH.md) measured XLA's MLP at parity-or-better
    # in-step once the GEMM region hit ~95% of HBM peak — the kernels stay
    # as the documented measured-negative path (core/tuned.py).
    use_fused_mlp: bool = False
    # int8 inference quantization of the body projections (qkv/proj/fc1/
    # fc2): per-output-channel int8 weights (quantized once from the f32
    # checkpoint via ops/quant.quantize_vit_params — the param tree changes
    # to <layer>/{kernel int8, scale, bias}) + dynamic per-token activation
    # quantization, s8×s8→s32 on the MXU (1.65× the bf16 rate on this
    # chip). Inference-only: apply() raises in train mode.
    quant_int8: bool = False
    # Hybrid backward families (XLA forward kept for its 85-95%-MFU forward
    # mega-fusions; only the VJP routes through a Pallas dual-output kernel
    # — targets the 56-79%-MFU backward dgrad+wgrad+dbias multi-output
    # fusions, BENCH.md round-3 closing accounting). Independent toggles so
    # each family can be A/B'd on the full step. Only meaningful when the
    # corresponding full-Pallas family is off.
    mlp_pallas_bwd: bool = False
    dense_pallas_bwd: bool = False
    # Save the attention softmax probabilities (bf16) from the forward
    # kernel so the backward skips the QK^T recompute and the whole masked
    # softmax pass — trades ~p bytes of HBM traffic for 1 of the backward's
    # 5 dots plus its wide VPU pass (round-4 attention experiment,
    # scripts/exp_attn4.py).
    attn_save_probs: bool = False
    # Run the Pallas kernels in interpreter mode (forces the kernel path on
    # non-TPU backends — used to validate the custom_partitioning sharded
    # lowering on the CPU test mesh; never enable on real hardware).
    pallas_interpret: bool = False
    # tanh-approx GELU is ~17% faster per forward on v5e (erf is VPU-heavy);
    # default False for activation parity with timm/DINO checkpoints — enable
    # for from-scratch (SSL) training.
    gelu_approx: bool = False
    # lax.scan over the depth axis: one traced block instead of 12 → ~an
    # order of magnitude smaller XLA graph and much faster compiles (remote
    # compiles here take minutes). Parameter tree gets a stacked leading
    # depth dim (use scan=False for timm-checkpoint-compatible trees or the
    # attention/intermediate introspection paths). The round-1 "remote
    # compile 500" on the scanned DINO step was an HBM OOM (22.6G > 15.75G:
    # scan stacks every layer's residuals for the backward) — combine with
    # remat_blocks=True, which remats the scan body and runs the full step
    # on one v5e (measured 172 ms/step at b96 vs 126 unrolled; scan is the
    # fast-compile/low-memory option, unrolled is the throughput option).
    scan_blocks: bool = False

    @property
    def num_patches_side(self) -> int:
        return self.img_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.num_patches_side ** 2


def _remat_policy(name: Optional[str]):
    """Resolve a ViTConfig.remat_policy name to a jax.checkpoint policy.

    None → recompute everything (jax.checkpoint's default). A base policy
    may be extended with checkpoint_name'd intermediates via '+', e.g.
    "dots_saveable+attn_out" saves GEMM outputs AND the Pallas attention
    kernel output (which is a custom_call, invisible to dots_saveable)."""
    if name is None:
        return None
    base, *named = name.split("+")
    try:
        policy = getattr(jax.checkpoint_policies, base)
    except AttributeError:
        raise ValueError(
            f"unknown remat_policy {base!r}; see jax.checkpoint_policies"
        ) from None
    if named:
        policy = jax.checkpoint_policies.save_from_both_policies(
            policy, jax.checkpoint_policies.save_only_these_names(*named)
        )
    return policy


def trunc_normal_init(stddev: float = 0.02):
    return nn.initializers.truncated_normal(stddev=stddev, lower=-2.0, upper=2.0)


class DropPath(nn.Module):
    """Per-sample stochastic depth.

    ``pack`` > 1 means the sequence axis carries ``pack`` independent
    samples' token runs (backbone-level sequence packing) — each packed
    sample draws its own mask so stochastic depth stays per-sample.

    ``mask`` lets the caller supply a precomputed keep mask of shape
    ``(B, pack, 1)`` (bool). VisionTransformer draws ONE uniform tensor for
    all layers' masks per forward instead of 2·depth tiny per-block
    bernoulli calls — measured at ~0.5 ms/step of pure RNG/dispatch
    overhead in the DINO production step (scripts/exp_prod4.py); the
    distribution is identical."""

    rate: float
    pack: int = 1

    @nn.compact
    def __call__(self, x, deterministic: bool, mask=None):
        if deterministic or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        if mask is None:
            rng = self.make_rng("droppath")
            if self.pack > 1:
                b = x.shape[0]
                mask = jax.random.bernoulli(rng, keep, (b, self.pack, 1))
            else:
                shape = (x.shape[0],) + (1,) * (x.ndim - 1)
                mask = jax.random.bernoulli(rng, keep, shape)
                return jnp.where(mask, x / keep, jnp.zeros_like(x))
        if self.pack > 1:
            mask = jnp.repeat(mask, x.shape[1] // self.pack, axis=1)
        else:
            mask = mask.reshape((x.shape[0],) + (1,) * (x.ndim - 1))
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


class PatchEmbed(nn.Module):
    """Space-to-depth + GEMM patch embedding (one big MXU matmul)."""

    patch_size: int
    embed_dim: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):  # x: (B, H, W, C) any float dtype
        b, h, w, c = x.shape
        p = self.patch_size
        gh, gw = h // p, w // p
        x = x.reshape(b, gh, p, gw, p, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, gh * gw, p * p * c)
        x = nn.Dense(
            self.embed_dim,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=trunc_normal_init(),
            name="proj",
        )(x.astype(self.dtype))
        return x, (gh, gw)


class Attention(nn.Module):
    num_heads: int
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Dtype = jnp.bfloat16
    use_pallas: bool = True
    pallas_interpret: bool = False
    # XLA forward + Pallas dual-output backward for the qkv/proj layers
    # (ops/dense.py) — same param tree as the nn.Dense path.
    dense_pallas_bwd: bool = False
    # >0: the sequence axis is pack·block_len tokens of independent packed
    # sub-sequences (backbone-level packing) — attention is block-diagonal.
    block_len: int = 0
    # forward kernel saves softmax probs; backward skips their recompute
    save_probs: bool = False
    # int8 qkv/proj GEMMs (inference quantization — see ViTConfig.quant_int8)
    quant_int8: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool, return_attn: bool = False):
        b, n, d = x.shape
        head_dim = d // self.num_heads
        if self.quant_int8:
            from tpuwsi.ops.quant import int8_dense

            kq, ks, kb = _QDenseParams(d, 3 * d, self.qkv_bias, name="qkv")()
            qkv = int8_dense(x.astype(self.dtype), kq, ks, kb,
                             out_dtype=self.dtype)
        elif self.dense_pallas_bwd:
            from tpuwsi.ops.dense import hybrid_dense

            wq, bq = _DenseParams(d, 3 * d, self.qkv_bias, name="qkv")()
            qkv = hybrid_dense(
                x.astype(self.dtype), wq, bq,
                interpret=self.pallas_interpret or None,
            )
        else:
            qkv = nn.Dense(
                3 * d,
                use_bias=self.qkv_bias,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                kernel_init=trunc_normal_init(),
                name="qkv",
            )(x)

        if return_attn:
            # Explicit attention map for saliency (reference DINO
            # get_last_selfattention; SURVEY §2.9).
            qkv_r = qkv.reshape(b, n, 3, self.num_heads, head_dim)
            q, k, v = [
                qkv_r[:, :, i].transpose(0, 2, 1, 3) for i in range(3)
            ]  # (B, H, N, hd)
            scale = head_dim ** -0.5
            s = jnp.einsum(
                "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
            ) * scale
            attn = jax.nn.softmax(s, axis=-1)
            out = jnp.einsum("bhqk,bhkd->bhqd", attn.astype(v.dtype), v)
            out = out.transpose(0, 2, 1, 3).reshape(b, n, d)
        else:
            attn = None
            if self.use_pallas:
                # Layout-free path: the Pallas whole-sequence MHA kernel
                # consumes the raw qkv GEMM output (no transposes at all);
                # dispatches itself to the XLA reference / flash kernel by
                # measured sequence-length rules.
                out = mha_from_qkv(
                    qkv, self.num_heads,
                    interpret=self.pallas_interpret or None,
                    training=not deterministic,
                    block_len=self.block_len,
                    save_probs=self.save_probs,
                )
                # Identity outside remat. Under remat_blocks, policies built
                # from save_only_these_names("attn_out") keep the kernel
                # output saved — dots_saveable alone treats the Pallas
                # custom_call as recomputable and re-runs the whole
                # attention forward inside the backward (exp_remat4.py).
                from jax.ad_checkpoint import checkpoint_name

                out = checkpoint_name(out, "attn_out")
            elif self.block_len:
                from tpuwsi.ops.attention import _mha_reference

                out = _mha_reference(
                    qkv, self.num_heads, head_dim ** -0.5, self.block_len
                )
            else:
                qkv_r = qkv.reshape(b, n, 3, self.num_heads, head_dim)
                q, k, v = [
                    qkv_r[:, :, i].transpose(0, 2, 1, 3) for i in range(3)
                ]
                out = attention_reference(q, k, v)
                out = out.transpose(0, 2, 1, 3).reshape(b, n, d)
            if self.attn_drop > 0.0 and not deterministic:
                # Note: dropout inside softmax-attn is not supported by the
                # fused kernel; applied on the output values instead (the
                # reference recipes never enable attn_drop — timm default 0).
                out = nn.Dropout(self.attn_drop)(out, deterministic=False)

        if self.quant_int8:
            from tpuwsi.ops.quant import int8_dense

            kp, ps, pb = _QDenseParams(d, d, name="proj")()
            out = int8_dense(out.astype(self.dtype), kp, ps, pb,
                             out_dtype=self.dtype)
        elif self.dense_pallas_bwd:
            wp, bp = _DenseParams(d, d, name="proj")()
            out = hybrid_dense(
                out.astype(self.dtype), wp, bp,
                interpret=self.pallas_interpret or None,
            )
        else:
            out = nn.Dense(
                d,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                kernel_init=trunc_normal_init(),
                name="proj",
            )(out)
        if self.proj_drop > 0.0:
            out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        return out, attn


class _DenseParams(nn.Module):
    """Owns a Dense layer's parameters (same tree: <name>/kernel, <name>/bias)
    without binding them to nn.Dense's apply — lets Mlp route the SAME params
    through either the fused Pallas kernel or the plain XLA matmuls."""

    in_features: int
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", trunc_normal_init(),
            (self.in_features, self.features), jnp.float32,
        )
        if not self.use_bias:
            return k, None
        b = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        return k, b


class _QDenseParams(nn.Module):
    """int8-quantized Dense parameter container (quant_int8 path): same
    layer name as _DenseParams but the tree holds <name>/{kernel int8,
    scale f32 per-out-channel[, bias f32]} — the layout
    ops/quant.quantize_vit_params produces from an f32 checkpoint."""

    in_features: int
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", nn.initializers.zeros,
            (self.in_features, self.features), jnp.int8,
        )
        s = self.param(
            "scale", nn.initializers.ones, (self.features,), jnp.float32
        )
        if not self.use_bias:
            return k, s, None
        b = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        return k, s, b


class _AttnParams(nn.Module):
    """qkv/proj parameter container matching the Attention module's tree
    (<name>/qkv/{kernel[,bias]}, <name>/proj/{kernel,bias}) for the fused
    pre-norm attention block path."""

    dim: int
    qkv_bias: bool = True

    @nn.compact
    def __call__(self):
        wq, bq = _DenseParams(self.dim, 3 * self.dim, self.qkv_bias,
                              name="qkv")()
        wp, bp = _DenseParams(self.dim, self.dim, name="proj")()
        if bq is None:
            bq = jnp.zeros((3 * self.dim,), jnp.float32)
        return wq, bq, wp, bp


class _LNParams(nn.Module):
    """Owns LayerNorm parameters (same tree: <name>/scale, <name>/bias) for
    routing through the fused pre-norm MLP block kernel."""

    features: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones, (self.features,),
                       jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        return s, b


class _MlpParams(nn.Module):
    """fc1/fc2 parameter container for the fused pre-norm block path —
    identical param tree to the Mlp module (<name>/fc{1,2}/{kernel,bias})."""

    in_features: int
    hidden: int
    out: int

    @nn.compact
    def __call__(self):
        w1, b1 = _DenseParams(self.in_features, self.hidden, name="fc1")()
        w2, b2 = _DenseParams(self.hidden, self.out, name="fc2")()
        return w1, b1, w2, b2


class Mlp(nn.Module):
    hidden_dim: int
    out_dim: int
    drop: float = 0.0
    dtype: Dtype = jnp.bfloat16
    gelu_approx: bool = False
    use_pallas: bool = False
    mlp_pallas_bwd: bool = False
    pallas_interpret: bool = False
    # int8 fc1/fc2 GEMMs (inference quantization — see ViTConfig.quant_int8)
    quant_int8: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool):
        d = x.shape[-1]
        if self.quant_int8:
            from tpuwsi.ops.quant import int8_dense

            k1, s1, qb1 = _QDenseParams(d, self.hidden_dim, name="fc1")()
            k2, s2, qb2 = _QDenseParams(self.hidden_dim, self.out_dim,
                                        name="fc2")()
            x = int8_dense(x.astype(self.dtype), k1, s1, qb1,
                           out_dtype=self.dtype)
            x = nn.gelu(x, approximate=self.gelu_approx)
            return int8_dense(x, k2, s2, qb2, out_dtype=self.dtype)
        w1, b1 = _DenseParams(d, self.hidden_dim, name="fc1")()
        w2, b2 = _DenseParams(self.hidden_dim, self.out_dim, name="fc2")()
        dt = self.dtype
        x = x.astype(dt)
        # Fused Pallas MLP: gelu(x@W1)@W2 with the 4×-wide hidden activation
        # resident in VMEM (the largest single HBM-traffic component of the
        # step — see ops/mlp.py). Dropout needs the unfused path.
        if self.use_pallas and (self.drop == 0.0 or deterministic):
            from tpuwsi.ops.mlp import fused_mlp

            return fused_mlp(
                x, w1, b1, w2, b2, approx=self.gelu_approx,
                interpret=self.pallas_interpret or None,
            )
        # Hybrid: XLA forward (keeps the forward mega-fusions), Pallas
        # fused backward (targets the 56-79%-MFU backward MOFs).
        if self.mlp_pallas_bwd and (self.drop == 0.0 or deterministic):
            from tpuwsi.ops.mlp import hybrid_mlp

            return hybrid_mlp(
                x, w1, b1, w2, b2, approx=self.gelu_approx,
                interpret=self.pallas_interpret or None,
            )
        x = x @ w1.astype(dt) + b1.astype(dt)
        x = nn.gelu(x, approximate=self.gelu_approx)
        if self.drop > 0.0:
            x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        x = x @ w2.astype(dt) + b2.astype(dt)
        if self.drop > 0.0:
            x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        return x


class Block(nn.Module):
    num_heads: int
    mlp_ratio: float
    qkv_bias: bool
    drop: float
    attn_drop: float
    drop_path: float
    dtype: Dtype = jnp.bfloat16
    ln_dtype: Dtype = jnp.float32
    use_pallas: bool = True
    use_fused_mlp: bool = False
    mlp_pallas_bwd: bool = False
    dense_pallas_bwd: bool = False
    pallas_interpret: bool = False
    gelu_approx: bool = False
    # Backbone-level sequence packing (see VisionTransformer): pack
    # sub-sequences of block_len tokens share the sequence axis.
    pack: int = 1
    block_len: int = 0
    save_probs: bool = False
    quant_int8: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool, return_attn: bool = False,
                 drop_path_mask=None):
        # drop_path_mask: optional (2, B, pack, 1) bool — the two sub-block
        # keep masks, precomputed by VisionTransformer in one draw.
        d = x.shape[-1]
        # NOTE on attention-side fusion (both variants measured SLOWER than
        # these separate ops in the DINO step; kept as standalone ops):
        # - ops/attention.fused_attention_block (whole sub-block as ONE op):
        #   6,298/6,046 vs 6,485 views/s — per-batch-element in-kernel GEMMs
        #   (M=seq_pad) lose to XLA's single batched GEMMs (M≈38k).
        # - ops/mlp.fused_ln_gemm + fused_gemm_residual around mha_from_qkv:
        #   6,048 — XLA ALREADY fuses LN/residual into its GEMM
        #   prologue/epilogue fusions; hoisting them into custom-calls just
        #   breaks XLA's fusion and adds boundaries. Lesson recorded in
        #   BENCH.md: only fuse what XLA cannot (cross-GEMM intermediates,
        #   e.g. the MLP hidden state), never its own fusion candidates.
        y = nn.LayerNorm(dtype=self.ln_dtype, name="norm1")(x)
        y, attn = Attention(
            num_heads=self.num_heads,
            qkv_bias=self.qkv_bias,
            attn_drop=self.attn_drop,
            proj_drop=self.drop,
            dtype=self.dtype,
            use_pallas=self.use_pallas,
            dense_pallas_bwd=self.dense_pallas_bwd,
            pallas_interpret=self.pallas_interpret,
            block_len=self.block_len,
            save_probs=self.save_probs,
            quant_int8=self.quant_int8,
            name="attn",
        )(y.astype(self.dtype), deterministic, return_attn)
        x = x + DropPath(self.drop_path, pack=self.pack, name="drop_path1")(
            y, deterministic,
            None if drop_path_mask is None else drop_path_mask[0])
        hidden = int(d * self.mlp_ratio)
        # Fully fused pre-norm MLP sub-block (LN + fc1 + gelu + fc2 +
        # residual as ONE Pallas op — see ops/mlp.py): active when no
        # dropout/stochastic-depth applies to this sub-block. Param tree is
        # identical to the unfused path (norm2/{scale,bias},
        # mlp/fc{1,2}/{kernel,bias}).
        fuse_block = (
            self.use_pallas and self.use_fused_mlp and not self.quant_int8
            and (deterministic or (self.drop == 0.0 and self.drop_path == 0.0))
        )
        if fuse_block:
            from tpuwsi.ops.mlp import fused_mlp_block

            ls, lb = _LNParams(d, name="norm2")()
            w1, b1, w2, b2 = _MlpParams(d, hidden, d, name="mlp")()
            x = fused_mlp_block(
                x.astype(self.dtype), ls, lb, w1, b1, w2, b2,
                approx=self.gelu_approx,
                interpret=self.pallas_interpret or None,
            )
            return x, attn
        y = nn.LayerNorm(dtype=self.ln_dtype, name="norm2")(x)
        y = Mlp(
            hidden_dim=hidden,
            out_dim=d,
            drop=self.drop,
            dtype=self.dtype,
            gelu_approx=self.gelu_approx,
            use_pallas=self.use_pallas and self.use_fused_mlp,
            mlp_pallas_bwd=self.mlp_pallas_bwd,
            pallas_interpret=self.pallas_interpret,
            quant_int8=self.quant_int8,
            name="mlp",
        )(y.astype(self.dtype), deterministic)
        x = x + DropPath(self.drop_path, pack=self.pack, name="drop_path2")(
            y, deterministic,
            None if drop_path_mask is None else drop_path_mask[1])
        return x, attn


class _ScanBlockBody(nn.Module):
    """Block body for nn.scan: drop-path rate arrives as a traced per-layer
    scan input (the static-rate fast path in DropPath doesn't apply)."""

    num_heads: int
    mlp_ratio: float
    qkv_bias: bool
    drop: float
    attn_drop: float
    dtype: Dtype
    ln_dtype: Dtype
    use_pallas: bool
    use_fused_mlp: bool
    pallas_interpret: bool
    gelu_approx: bool
    deterministic: bool
    mlp_pallas_bwd: bool = False
    dense_pallas_bwd: bool = False
    pack: int = 1
    block_len: int = 0
    save_probs: bool = False
    quant_int8: bool = False
    # False when drop_path_rate == 0: the scan still receives a (dummy)
    # mask input for structure, but it must not be consumed — its shape is
    # not broadcast-correct and rate-0 needs no masking at all.
    droppath_active: bool = True

    @nn.compact
    def __call__(self, x, scan_in):
        # scan_in: (dpr, masks) per-layer scan inputs — the traced drop-path
        # rate and the (2, B, pack, 1) precomputed keep masks (drawn ONCE for
        # all layers by VisionTransformer; also keeps RNG out of the remat'd
        # body so the backward replay recomputes no threefry).
        dpr, dp_masks = scan_in
        d = x.shape[-1]
        det = self.deterministic
        site = iter(range(2))

        def droppath(y):
            if det or not self.droppath_active:
                return y
            keep = 1.0 - dpr
            mask = dp_masks[next(site)]
            if self.pack > 1:
                # per-sample masks inside packed sequences (see DropPath)
                mask = jnp.repeat(mask, y.shape[1] // self.pack, axis=1)
            else:
                mask = mask.reshape((y.shape[0],) + (1,) * (y.ndim - 1))
            # keep is a traced f32 scalar — cast so the residual stream dtype
            # is preserved (scan carry types must be invariant).
            return jnp.where(mask, y / keep.astype(y.dtype), jnp.zeros_like(y))

        y = nn.LayerNorm(dtype=self.ln_dtype, name="norm1")(x)
        y, _ = Attention(
            num_heads=self.num_heads,
            qkv_bias=self.qkv_bias,
            attn_drop=self.attn_drop,
            proj_drop=self.drop,
            dtype=self.dtype,
            use_pallas=self.use_pallas,
            dense_pallas_bwd=self.dense_pallas_bwd,
            pallas_interpret=self.pallas_interpret,
            block_len=self.block_len,
            save_probs=self.save_probs,
            quant_int8=self.quant_int8,
            name="attn",
        )(y.astype(self.dtype), det, False)
        x = x + droppath(y)
        # The scan body's drop-path rate is a TRACED per-layer input, so the
        # fused pre-norm block (which skips drop-path) can only apply when
        # deterministic — training keeps the unfused path here.
        if (self.use_pallas and self.use_fused_mlp and det
                and not self.quant_int8):
            from tpuwsi.ops.mlp import fused_mlp_block

            ls, lb = _LNParams(d, name="norm2")()
            w1, b1, w2, b2 = _MlpParams(
                d, int(d * self.mlp_ratio), d, name="mlp"
            )()
            x = fused_mlp_block(
                x.astype(self.dtype), ls, lb, w1, b1, w2, b2,
                approx=self.gelu_approx,
                interpret=self.pallas_interpret or None,
            )
            return x, None
        y = nn.LayerNorm(dtype=self.ln_dtype, name="norm2")(x)
        y = Mlp(
            hidden_dim=int(d * self.mlp_ratio),
            out_dim=d,
            drop=self.drop,
            dtype=self.dtype,
            gelu_approx=self.gelu_approx,
            use_pallas=self.use_pallas and self.use_fused_mlp,
            mlp_pallas_bwd=self.mlp_pallas_bwd,
            pallas_interpret=self.pallas_interpret,
            quant_int8=self.quant_int8,
            name="mlp",
        )(y.astype(self.dtype), det)
        x = x + droppath(y)
        return x, None


def interpolate_pos_encoding(
    pos_embed: jax.Array, npatch: int, gh: int, gw: int
) -> jax.Array:
    """Bicubic-resample the (1, 1+N, D) positional table to a new grid.

    Parity: DINO VisionTransformer.interpolate_pos_encoding (SURVEY §2.9) —
    lets one checkpoint serve multiple tile sizes (global 224 vs local 96
    multi-crop views).
    """
    n = pos_embed.shape[1] - 1
    if npatch == n:
        return pos_embed
    cls_pos = pos_embed[:, :1]
    patch_pos = pos_embed[:, 1:]
    dim = pos_embed.shape[-1]
    side = int(math.sqrt(n))
    patch_pos = patch_pos.reshape(1, side, side, dim)
    patch_pos = jax.image.resize(
        patch_pos, (1, gh, gw, dim), method="bicubic"
    )
    patch_pos = patch_pos.reshape(1, gh * gw, dim)
    return jnp.concatenate([cls_pos, patch_pos], axis=1)


class VisionTransformer(nn.Module):
    """DINO/timm-geometry ViT with cls token and learned position embedding."""

    config: ViTConfig

    @nn.compact
    def __call__(
        self,
        x,
        deterministic: bool = True,
        return_all_tokens: bool = False,
        return_last_attention: bool = False,
        intermediate_layers: Optional[int] = None,
    ):
        cfg = self.config
        if cfg.quant_int8 and not deterministic:
            raise ValueError(
                "quant_int8 is inference-only: a backward through the "
                "rounded int8 GEMMs would need straight-through "
                "estimators, which changes training semantics"
            )
        b = x.shape[0]
        x, (gh, gw) = PatchEmbed(
            patch_size=cfg.patch_size,
            embed_dim=cfg.embed_dim,
            dtype=cfg.dtype,
            name="patch_embed",
        )(x)
        n = x.shape[1]

        cls_token = self.param(
            "cls_token", trunc_normal_init(), (1, 1, cfg.embed_dim), jnp.float32
        )
        pos_embed = self.param(
            "pos_embed",
            trunc_normal_init(),
            (1, cfg.num_patches + 1, cfg.embed_dim),
            jnp.float32,
        )
        cls = jnp.broadcast_to(cls_token, (b, 1, cfg.embed_dim)).astype(cfg.dtype)
        x = jnp.concatenate([cls, x], axis=1)
        pos = interpolate_pos_encoding(pos_embed, n, gh, gw)
        x = x + pos.astype(cfg.dtype)
        if cfg.drop_rate > 0.0:
            x = nn.Dropout(cfg.drop_rate)(x, deterministic=deterministic)

        # Backbone-level sequence packing for short sequences (multi-crop
        # local views: 37 tokens waste 91% of a 128-row score tile). The
        # Pallas MHA kernel packs 128//n sub-sequences per program either
        # way; doing the (B,n,D)→(B/p,p·n,D) reshape ONCE here at token
        # width — instead of per-attention-call at qkv (3D) width — removed
        # ~6 ms/step of tiled-layout relayout copies from the DINO step
        # (round-3 trace). Every non-attention op is row-elementwise, so
        # only attention (block-diagonal mask) and stochastic depth
        # (per-packed-sample masks) need to know.
        n_tok = 1 + n
        seq_pack = 1
        if (
            cfg.use_pallas_attention
            and n_tok <= 64
            and not return_last_attention
            and not intermediate_layers
            and (jax.default_backend() == "tpu" or cfg.pallas_interpret)
        ):
            p = 128 // n_tok
            if p > 1 and b % p == 0:
                seq_pack = p
                x = x.reshape(b // p, p * n_tok, cfg.embed_dim)
        blk_len = n_tok if seq_pack > 1 else 0

        dpr = [
            cfg.drop_path_rate * i / max(cfg.depth - 1, 1)
            for i in range(cfg.depth)
        ]
        # Stochastic-depth masks for ALL layers in ONE uniform draw
        # (depth, 2 sub-blocks, B, pack, 1), thresholded per-layer at that
        # layer's keep rate. Replaces 2·depth tiny bernoulli ops per forward
        # — measured ~0.5 ms/step of RNG/dispatch overhead in the DINO
        # production step (scripts/exp_prod4.py); same distribution, and the
        # masks stay OUTSIDE any remat boundary (no threefry in the
        # backward replay).
        dp_masks = None
        if not deterministic and cfg.drop_path_rate > 0.0:
            keep = 1.0 - jnp.asarray(dpr, jnp.float32)
            u = jax.random.uniform(
                self.make_rng("droppath"),
                (cfg.depth, 2, x.shape[0], seq_pack, 1),
            )
            dp_masks = u < keep[:, None, None, None, None]
        intermediates = []
        last_attn = None
        use_scan = (
            cfg.scan_blocks
            and not return_last_attention
            and not intermediate_layers
        )
        if use_scan:
            # remat inside scan: without it the scanned backward stacks every
            # layer's residuals (≈22.6 GB for the ViT-S DINO step at b96 —
            # the round-1 "remote compile 500" was this HBM OOM, not a
            # compiler bug). Rematerializing the block body keeps the scan's
            # memory at O(1) layers for ~1/3 extra backward FLOPs.
            body = (
                nn.remat(
                    _ScanBlockBody,
                    policy=_remat_policy(
                        "dots_with_no_batch_dims_saveable"
                        if cfg.remat_policy == "auto"
                        else cfg.remat_policy
                    ),
                )
                if cfg.remat_blocks
                else _ScanBlockBody
            )
            ScanBlocks = nn.scan(
                body,
                variable_axes={"params": 0},
                # droppath masks are precomputed scan inputs (dp_masks), not
                # per-layer rng splits
                split_rngs={"params": True, "dropout": True},
                in_axes=0,
                length=cfg.depth,
            )
            scan_masks = (
                dp_masks if dp_masks is not None
                else jnp.ones((cfg.depth, 2, 1, 1, 1), bool)
            )
            x, _ = ScanBlocks(
                num_heads=cfg.num_heads,
                mlp_ratio=cfg.mlp_ratio,
                qkv_bias=cfg.qkv_bias,
                drop=cfg.drop_rate,
                attn_drop=cfg.attn_drop_rate,
                dtype=cfg.dtype,
                ln_dtype=cfg.ln_dtype,
                use_pallas=cfg.use_pallas_attention,
                use_fused_mlp=cfg.use_fused_mlp,
                mlp_pallas_bwd=cfg.mlp_pallas_bwd,
                dense_pallas_bwd=cfg.dense_pallas_bwd,
                pallas_interpret=cfg.pallas_interpret,
                gelu_approx=cfg.gelu_approx,
                deterministic=deterministic,
                pack=seq_pack,
                block_len=blk_len,
                save_probs=cfg.attn_save_probs,
                quant_int8=cfg.quant_int8,
                droppath_active=dp_masks is not None,
                name="blocks_scan",
            )(x, (jnp.asarray(dpr, dtype=jnp.float32), scan_masks))
        BlockCls = (
            nn.remat(Block, static_argnums=(2, 3),
                     policy=_remat_policy(
                         None if cfg.remat_policy == "auto"
                         else cfg.remat_policy))
            if cfg.remat_blocks
            else Block
        )
        for i in range(cfg.depth) if not use_scan else ():
            want_attn = return_last_attention and i == cfg.depth - 1
            x, attn = BlockCls(
                num_heads=cfg.num_heads,
                mlp_ratio=cfg.mlp_ratio,
                qkv_bias=cfg.qkv_bias,
                drop=cfg.drop_rate,
                attn_drop=cfg.attn_drop_rate,
                drop_path=dpr[i],
                dtype=cfg.dtype,
                ln_dtype=cfg.ln_dtype,
                use_pallas=cfg.use_pallas_attention,
                use_fused_mlp=cfg.use_fused_mlp,
                mlp_pallas_bwd=cfg.mlp_pallas_bwd,
                dense_pallas_bwd=cfg.dense_pallas_bwd,
                pallas_interpret=cfg.pallas_interpret,
                gelu_approx=cfg.gelu_approx,
                pack=seq_pack,
                block_len=blk_len,
                save_probs=cfg.attn_save_probs,
                quant_int8=cfg.quant_int8,
                name=f"blocks_{i}",
            )(x, deterministic, want_attn,
              None if dp_masks is None else dp_masks[i])
            if want_attn:
                last_attn = attn
            if intermediate_layers and i >= cfg.depth - intermediate_layers:
                intermediates.append(x)

        final_norm = nn.LayerNorm(dtype=cfg.ln_dtype, name="norm")
        x = final_norm(x)

        if return_last_attention:
            return last_attn
        if intermediate_layers:
            # Parity: DINO get_intermediate_layers — final-norm applied to the
            # outputs of the last-k blocks (SURVEY §2.9).
            return [final_norm(h) for h in intermediates[:-1]] + [x]
        if seq_pack > 1:
            # unpack: each packed sample's cls token sits at k·n_tok
            cls_out = x[:, ::n_tok].reshape(b, cfg.embed_dim)
            if return_all_tokens:
                return x.reshape(b, n_tok, cfg.embed_dim)
        else:
            cls_out = x[:, 0]
            if return_all_tokens:
                return x
        if cfg.num_classes > 0:
            logits = nn.Dense(
                cfg.num_classes,
                dtype=jnp.float32,
                param_dtype=jnp.float32,
                kernel_init=trunc_normal_init(),
                name="head",
            )(cls_out.astype(jnp.float32))
            return logits
        return cls_out.astype(jnp.float32)


def vit_tiny(patch_size: int = 16, **kw) -> ViTConfig:
    return ViTConfig(patch_size=patch_size, embed_dim=192, depth=12, num_heads=3, **kw)


def vit_small(patch_size: int = 16, **kw) -> ViTConfig:
    return ViTConfig(patch_size=patch_size, embed_dim=384, depth=12, num_heads=6, **kw)


def vit_base(patch_size: int = 16, **kw) -> ViTConfig:
    return ViTConfig(patch_size=patch_size, embed_dim=768, depth=12, num_heads=12, **kw)


def vit_large(patch_size: int = 16, **kw) -> ViTConfig:
    """timm vit_large geometry (1024/24/16). No GipMed recipe uses it, but
    the reference can name any timm ViT (train.py:482-495) — kept for
    surface breadth; memory-bound configs combine with remat_blocks."""
    return ViTConfig(patch_size=patch_size, embed_dim=1024, depth=24,
                     num_heads=16, **kw)
