"""int8 inference quantization for the ViT GEMMs (serving / extraction).

The MIL pipeline's production serving workload is bulk feature extraction
over whole cohorts (reference: ``utils_MIL`` feature pickles consumed by
every MIL trainer; the features are produced by a frozen backbone forward).
That forward is GEMM-dominated — at the 257-token tile shape ~89% of the
FLOPs sit in the qkv/proj/fc1/fc2 projections — and this chip's MXU runs
s8×s8→s32 contractions at 1.65× its bf16 rate at compute-bound shapes
(microbenched 240.7 TOP/s vs 146 TF/s at 8192³).

**Measured DISPOSITION (BENCH.md round-4 int8 study): negative on this
chip at ViT serving shapes** — the serving GEMMs are memory-bound
(weights ≪ activations; int8 does not shrink the dominant output/quant
traffic) and XLA's int8 emitter collapses at small N (proj 384×384 runs
0.22× bf16). ViT-S extraction measures 0.87×, ViT-L 1.02×. The path is
kept accuracy-pinned (cos > 0.999 vs f32) for int8-native deployments,
in the repo's measured-negative convention (see ops/dense.py).

Post-training dynamic quantization targets exactly those GEMMs:

- **weights**: per-output-channel symmetric int8 (scale = max|W[:, j]|/127),
  quantized ONCE from the f32 checkpoint (``quantize_vit_params``) — the
  serving loop never re-reads the f32 weights, and the int8 tree also
  halves the weight HBM traffic vs bf16.
- **activations**: dynamic per-token symmetric int8 (scale = max|x|/127
  along the feature axis, computed in the forward). LayerNorm directly
  precedes every quantized GEMM in the pre-norm ViT, which bounds the
  activation range and is what makes the per-token scheme accurate.
- everything else (LayerNorm, softmax/attention kernel, GELU, residual
  stream, patch embed, head) stays in the bf16/f32 tuned-inference config.

Training is out of scope by design: the straight-through estimators a
quantized backward needs would change training semantics; the CLIs only
engage ``quant_int8`` on inference paths.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_weight(w) -> tuple[jax.Array, jax.Array]:
    """f32 (D, F) kernel → (int8 kernel, (F,) f32 per-output-channel scale)."""
    w = jnp.asarray(w, jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(w), axis=0), 1e-12) / 127.0
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return q, scale


def int8_dense(x, kernel_q, kernel_scale, bias, out_dtype=None):
    """y = dequant(quant(x) @ kernel_q) + bias with s32 MXU accumulation.

    ``x``: (..., D) float; ``kernel_q``: (D, F) int8; ``kernel_scale``:
    (F,) f32; ``bias``: (F,) f32 or None. Activation quantization is
    dynamic per-token (symmetric, max-abs over the feature axis).
    """
    out_dtype = out_dtype or x.dtype
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    s_x = jnp.maximum(amax, 1e-12) / 127.0
    xq = jnp.clip(jnp.round(xf / s_x), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, kernel_q,
        (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * (s_x * kernel_scale)
    if bias is not None:
        y = y + bias
    return y.astype(out_dtype)


# The Dense layers the int8 path covers: the transformer body projections.
# patch_embed/head stay f32/bf16 (one GEMM each; the body is 12 layers).
_QUANT_LAYER_NAMES = ("qkv", "proj", "fc1", "fc2")


def _is_quant_kernel(path) -> bool:
    names = [getattr(p, "key", None) for p in path]
    return (
        names[-1] == "kernel"
        and len(names) >= 2
        and names[-2] in _QUANT_LAYER_NAMES
        # patch_embed/proj is a GEMM too, but it is excluded: its input is
        # normalized pixel data, not LN output, and it is 1 GEMM vs the
        # body's 48
        and "patch_embed" not in names
    )


def quantize_vit_params(variables):
    """f32 ViT param tree → the quant_int8 tree (int8 kernels + scales).

    Works on both the per-layer (``blocks_i``) and scanned
    (``blocks_scan``, stacked leading depth axis) layouts: the per-channel
    scale reduction is over axis -2 (the in-features axis) so stacked
    kernels quantize per (layer, out-channel).
    """
    flat = {}

    def visit(path, leaf):
        names = tuple(getattr(p, "key", p) for p in path)
        if _is_quant_kernel(path):
            w = jnp.asarray(leaf, jnp.float32)
            scale = jnp.maximum(
                jnp.max(jnp.abs(w), axis=-2), 1e-12) / 127.0
            flat[names] = jnp.clip(
                jnp.round(w / scale[..., None, :]), -127, 127
            ).astype(jnp.int8)
            flat[names[:-1] + ("scale",)] = scale
        else:
            flat[names] = leaf

    jax.tree_util.tree_map_with_path(visit, variables)
    out = {}
    for names, leaf in flat.items():
        node = out
        for n in names[:-1]:
            node = node.setdefault(n, {})
        node[names[-1]] = leaf
    return out
