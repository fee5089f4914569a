"""MIL heads over frozen tile embeddings.

Parity target: the reference's MIL-over-features path — bags of precomputed
tile features (datasets.py:820 ``Features_MILdataset``), attention weights
saved before/after softmax (utils_MIL.py:1502-1600
``save_all_slides_and_models_data``), and the linear tile-score readout
``score = (w1 - w0)ᵀ f`` (utils_MIL.py:1603-1630
``extract_tile_scores_for_slide``). The attention-pooling architecture is the
gated-attention MIL of Ilse et al. that the saved weight tensors imply.

TPU-first: bags are fixed-size padded arrays with validity masks (no ragged
shapes under jit); the pooling softmax is masked; bag sizes up to 500 tiles
(train.py:387-388) are one small GEMM chain. For bags beyond HBM the bag axis
can be sharded over the mesh and the softmax normaliser reduced with psum
(SURVEY §5.7) — see ``masked_attention_pool``.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpuwsi.models.vit import trunc_normal_init

NEG_INF = -1e30


def masked_attention_pool(scores, feats, mask):
    """Softmax-pool feats (B, N, D) by scores (B, N), masking invalid tiles.

    Returns (pooled (B, D), attn_before (B, N), attn_after (B, N)) — the
    before/after-softmax weights the reference exports to xlsx
    (utils_MIL.py:1539-1546).
    """
    scores = jnp.where(mask, scores, NEG_INF)
    attn = jax.nn.softmax(scores, axis=-1)
    pooled = jnp.einsum("bn,bnd->bd", attn, feats)
    return pooled, scores, attn


def sharded_attention_pool(mesh, scores, feats, mask, axis: str = "data"):
    """``masked_attention_pool`` with the BAG axis sharded over a mesh axis —
    sequence parallelism over tiles (SURVEY §5.7): each device holds N/k
    tiles of every bag; the softmax max rides ``pmax`` and the normaliser +
    pooled sum ride ``psum``, so bag length scales past one device's HBM.

    scores (B, N), feats (B, N, D), mask (B, N) with N divisible by the axis
    size. Returns the same triple as ``masked_attention_pool``; ``pooled``
    is replicated, the attention maps stay bag-sharded.
    """
    from jax.sharding import PartitionSpec as P

    try:  # jax.shard_map is the stable home since 0.8; keep the old path
        from jax import shard_map
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map

    def local(scores, feats, mask):
        s = jnp.where(mask, scores, NEG_INF)
        # global max for stability; a fully-masked bag degrades to uniform
        # attention exactly like jax.nn.softmax over all-NEG_INF rows
        m = jax.lax.pmax(s.max(-1), axis)
        e = jnp.exp(s - m[:, None])
        denom = jax.lax.psum(e.sum(-1), axis)
        attn = e / denom[:, None]
        pooled = jax.lax.psum(jnp.einsum("bn,bnd->bd", attn, feats), axis)
        return pooled, s, attn

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, axis), P(None, axis, None), P(None, axis)),
        out_specs=(P(None), P(None, axis), P(None, axis)),
    )(scores, feats, mask)


class GatedAttentionMIL(nn.Module):
    """Gated attention pooling + linear classifier over a feature bag."""

    hidden_dim: int = 128
    num_classes: int = 2
    gated: bool = True
    temperature: float = 1.0

    @nn.compact
    def __call__(self, feats, mask=None, return_attention: bool = False):
        # feats: (B, N, D) fp32; mask: (B, N) bool (True = real tile)
        if mask is None:
            mask = jnp.ones(feats.shape[:2], dtype=bool)
        h = nn.tanh(
            nn.Dense(self.hidden_dim, kernel_init=trunc_normal_init(), name="att_V")(
                feats
            )
        )
        if self.gated:
            g = nn.sigmoid(
                nn.Dense(
                    self.hidden_dim, kernel_init=trunc_normal_init(), name="att_U"
                )(feats)
            )
            h = h * g
        scores = nn.Dense(1, kernel_init=trunc_normal_init(), name="att_w")(h)
        scores = scores[..., 0] / self.temperature
        pooled, before, after = masked_attention_pool(scores, feats, mask)
        logits = nn.Dense(
            self.num_classes, kernel_init=trunc_normal_init(), name="classifier"
        )(pooled)
        if return_attention:
            return logits, before, after
        return logits


class MeanPoolMIL(nn.Module):
    """Masked mean pooling baseline (the reference's mean-softmax slide
    aggregation, train.py:1288, expressed as a MIL head)."""

    num_classes: int = 2

    @nn.compact
    def __call__(self, feats, mask=None):
        if mask is None:
            mask = jnp.ones(feats.shape[:2], dtype=bool)
        m = mask.astype(feats.dtype)
        pooled = jnp.einsum("bn,bnd->bd", m, feats) / jnp.maximum(
            m.sum(-1, keepdims=True), 1.0
        )
        return nn.Dense(
            self.num_classes, kernel_init=trunc_normal_init(), name="classifier"
        )(pooled)


def tile_scores_from_head(
    features: jax.Array,
    head_kernel: jax.Array,
    receptor_slice: int | None = None,
) -> jax.Array:
    """Reference tile-score readout: (w1 - w0)ᵀ f per tile.

    Parity: utils_MIL.py:1623-1629 — last-layer class-1 minus class-0 weight
    rows dotted with each tile feature; for Receptor+is_Tumor paired models
    (1024-dim concatenated features) only the first ``receptor_slice`` (512)
    weight/feature dims are used.
    """
    w = head_kernel  # (D, num_classes)
    diff = w[:, 1] - w[:, 0]
    if receptor_slice is not None:
        return features[..., :receptor_slice] @ diff[:receptor_slice]
    return features @ diff
