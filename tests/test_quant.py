"""int8 inference quantization (ops/quant.py + ViTConfig.quant_int8).

The serving/extraction counterpart of the bf16 training config: per-channel
int8 weights + dynamic per-token activation quant on the body projections,
s8×s8→s32 on the MXU. Reference workload it accelerates: bulk feature
extraction feeding the MIL pipeline (utils_MIL feature pickles).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuwsi.models.vit import VisionTransformer, vit_tiny
from tpuwsi.ops.quant import int8_dense, quantize_vit_params, quantize_weight


def _cos(a, b):
    return (a * b).sum(-1) / (
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1)
    )


def test_int8_dense_matches_f32_within_quant_error():
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (4, 37, 192))
    w = jax.random.normal(jax.random.PRNGKey(1), (192, 384)) * 0.05
    b = jax.random.normal(jax.random.PRNGKey(2), (384,)) * 0.1
    wq, ws = quantize_weight(w)
    y = np.asarray(x @ w + b)
    yq = np.asarray(int8_dense(x, wq, ws, b))
    # symmetric 8-bit double-quantization error on gaussian data
    assert np.abs(y - yq).max() / np.abs(y).max() < 0.05
    assert _cos(y, yq).min() > 0.999


def test_int8_dense_no_bias():
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 64))
    w = jax.random.normal(jax.random.PRNGKey(1), (64, 32))
    wq, ws = quantize_weight(w)
    y = np.asarray(int8_dense(x, wq, ws, None))
    assert _cos(np.asarray(x @ w), y).min() > 0.999


def _vit_cfg(**kw):
    return dataclasses.replace(
        vit_tiny(num_classes=0, img_size=64, dtype=jnp.float32,
                 use_pallas_attention=False),
        **kw,
    )


@pytest.mark.parametrize("scan", [False, True])
def test_quantized_vit_matches_f32_features(scan):
    """quantize_vit_params output must bind exactly to the quant_int8
    module tree (both block layouts), and the quantized features must stay
    close to f32 — random-init weights are the adversarial case; trained
    nets quantize better."""
    cfg = _vit_cfg(scan_blocks=scan)
    m = VisionTransformer(cfg)
    mq = VisionTransformer(dataclasses.replace(cfg, quant_int8=True))
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3))
    p = m.init(jax.random.PRNGKey(1), x)
    pq = quantize_vit_params(p)
    want = jax.tree_util.tree_structure(
        jax.eval_shape(lambda: mq.init(jax.random.PRNGKey(1), x)))
    assert want == jax.tree_util.tree_structure(pq)

    f = np.asarray(m.apply(p, x))
    fq = np.asarray(mq.apply(pq, x))
    assert _cos(f, fq).min() > 0.999


def test_quant_int8_is_inference_only():
    cfg = _vit_cfg(quant_int8=True)
    m = VisionTransformer(cfg)
    x = jnp.zeros((1, 64, 64, 3))
    pq = quantize_vit_params(
        VisionTransformer(_vit_cfg()).init(jax.random.PRNGKey(1), x))
    with pytest.raises(ValueError, match="inference-only"):
        m.apply(pq, x, deterministic=False,
                rngs={"droppath": jax.random.PRNGKey(0)})


def test_quantizer_leaves_non_body_params_f32():
    """patch_embed / LN / pos_embed / cls_token stay untouched — only the
    body projections (qkv/proj/fc1/fc2) change representation."""
    m = VisionTransformer(_vit_cfg())
    p = m.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)))
    pq = quantize_vit_params(p)
    pe = pq["params"]["patch_embed"]["proj"]["kernel"]
    assert pe.dtype == jnp.float32
    np.testing.assert_array_equal(
        np.asarray(pe),
        np.asarray(p["params"]["patch_embed"]["proj"]["kernel"]))
    qkv = pq["params"]["blocks_0"]["attn"]["qkv"]
    assert qkv["kernel"].dtype == jnp.int8
    assert qkv["scale"].shape == (3 * 192,)
    # classifier-head ViTs: the head Dense also stays f32
    mh = VisionTransformer(_vit_cfg(num_classes=2))
    ph = quantize_vit_params(
        mh.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3))))
    assert ph["params"]["head"]["kernel"].dtype == jnp.float32
