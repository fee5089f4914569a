import jax
import jax.numpy as jnp
import numpy as np

from tpuwsi.models import (
    DINOHead,
    GatedAttentionMIL,
    ResNetTruncBaseline,
    create_model,
    tile_scores_from_head,
    vit_small,
    vit_tiny,
)
from tpuwsi.models.vit import VisionTransformer


def test_vit_tiny_forward_shapes():
    cfg = vit_tiny(num_classes=2, use_pallas_attention=False, dtype=jnp.float32)
    model = VisionTransformer(cfg)
    x = jnp.zeros((2, 224, 224, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    logits = model.apply(params, x)
    assert logits.shape == (2, 2)


def test_vit_small_feature_dim_is_384():
    # Parity: reference exports 384-dim ViT-S features (train.py:1203).
    cfg = vit_small(num_classes=0, use_pallas_attention=False, dtype=jnp.float32)
    model = VisionTransformer(cfg)
    x = jnp.zeros((1, 224, 224, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    feats = model.apply(params, x)
    assert feats.shape == (1, 384)


def test_vit_multires_same_params():
    # interpolate_pos_encoding: one checkpoint serves 224 globals + 96 locals.
    cfg = vit_tiny(num_classes=0, use_pallas_attention=False, dtype=jnp.float32)
    model = VisionTransformer(cfg)
    x224 = jnp.zeros((1, 224, 224, 3), jnp.float32)
    x96 = jnp.zeros((1, 96, 96, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x224)
    f224 = model.apply(params, x224)
    f96 = model.apply(params, x96)
    assert f224.shape == f96.shape == (1, 192)


def test_vit_last_selfattention():
    cfg = vit_tiny(num_classes=0, use_pallas_attention=False, dtype=jnp.float32)
    model = VisionTransformer(cfg)
    x = jnp.zeros((1, 96, 96, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    attn = model.apply(params, x, return_last_attention=True)
    n = (96 // 16) ** 2 + 1
    assert attn.shape == (1, cfg.num_heads, n, n)
    np.testing.assert_allclose(np.asarray(attn.sum(-1)), 1.0, atol=1e-5)


def test_vit_intermediate_layers():
    cfg = vit_tiny(num_classes=0, use_pallas_attention=False, dtype=jnp.float32)
    model = VisionTransformer(cfg)
    x = jnp.zeros((1, 96, 96, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    outs = model.apply(params, x, intermediate_layers=4)
    assert len(outs) == 4
    assert all(o.shape == (1, 37, 192) for o in outs)


def test_dino_head_output_and_l2():
    head = DINOHead(out_dim=1024, hidden_dim=64, bottleneck_dim=32)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 192))
    params = head.init(jax.random.PRNGKey(0), x)
    out = head.apply(params, x)
    assert out.shape == (4, 1024)


def test_registry_names():
    for name in [
        "vit_tiny_patch16_224",
        "vit_small_patch16_224_dino",
        "vit_base_patch16_224",
    ]:
        m = create_model(name, num_classes=2, use_pallas_attention=False)
        assert isinstance(m, VisionTransformer)


def test_resnet_trunc_1024_features():
    model = ResNetTruncBaseline()
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    feats = model.apply(variables, x)
    assert feats.shape == (1, 1024)


def test_mil_attention_masking():
    model = GatedAttentionMIL(num_classes=2)
    feats = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 384))
    mask = jnp.arange(16)[None, :] < jnp.array([[16], [5]])
    params = model.init(jax.random.PRNGKey(1), feats, mask)
    logits, before, after = model.apply(
        params, feats, mask, return_attention=True
    )
    assert logits.shape == (2, 2)
    # Masked tiles get exactly zero post-softmax attention.
    np.testing.assert_allclose(np.asarray(after[1, 5:]), 0.0, atol=1e-8)
    np.testing.assert_allclose(np.asarray(after.sum(-1)), 1.0, atol=1e-6)


def test_tile_score_readout():
    # score = (w1 - w0)^T f  (utils_MIL.py:1623-1624)
    f = jnp.array([[1.0, 2.0], [0.5, -1.0]])
    w = jnp.array([[0.1, 0.3], [0.2, -0.2]])  # (D=2, C=2)
    scores = tile_scores_from_head(f, w)
    expected = f @ (w[:, 1] - w[:, 0])
    np.testing.assert_allclose(np.asarray(scores), np.asarray(expected))
