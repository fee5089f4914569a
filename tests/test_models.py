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
        "vit_large_patch16_224",
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


def test_backbone_sequence_packing_matches_reference():
    """Backbone-level sequence packing (local crops: 37 tokens → 3 packed
    per 128-row program) must reproduce the unpacked XLA-reference forward.
    The op-level packed-vs-internal-packing paths are bit-identical (see
    test_attention); here the whole ViT forward is compared end to end."""
    from tpuwsi.models.vit import VisionTransformer, vit_tiny

    import dataclasses

    cfg_p = dataclasses.replace(
        vit_tiny(num_classes=0, img_size=96, use_pallas_attention=True,
                 pallas_interpret=True), depth=3)
    cfg_r = dataclasses.replace(
        vit_tiny(num_classes=0, img_size=96, use_pallas_attention=False),
        depth=3)
    m_p, m_r = VisionTransformer(cfg_p), VisionTransformer(cfg_r)
    # batch 6 is divisible by pack=128//37=3 → backbone packing engages
    x = jax.random.normal(jax.random.PRNGKey(1), (6, 96, 96, 3), jnp.float32)
    params = m_p.init(jax.random.PRNGKey(0), x[:1])
    o_p = np.asarray(m_p.apply(params, x))
    o_r = np.asarray(m_r.apply(params, x))
    assert o_p.shape == (6, 192)
    # bf16 compute with different GEMM/accumulation orders
    np.testing.assert_allclose(o_p, o_r, atol=0.06, rtol=0.05)


def test_backbone_sequence_packing_all_tokens_shape():
    from tpuwsi.models.vit import VisionTransformer, vit_tiny

    import dataclasses

    cfg = dataclasses.replace(
        vit_tiny(num_classes=0, img_size=96, use_pallas_attention=True,
                 pallas_interpret=True), depth=2)
    m = VisionTransformer(cfg)
    x = jnp.zeros((6, 96, 96, 3), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x[:1])
    toks = m.apply(params, x, return_all_tokens=True)
    assert toks.shape == (6, 37, 192)


def test_droppath_pack_independent_masks():
    """With pack>1 each packed sample draws its own stochastic-depth mask:
    rows within one sub-sequence share fate, different subs differ."""
    from tpuwsi.models.vit import DropPath

    dp = DropPath(rate=0.5, pack=3)
    x = jnp.ones((4, 3 * 37, 8))
    y = dp.apply({}, x, False, rngs={"droppath": jax.random.PRNGKey(0)})
    y = np.asarray(y).reshape(4, 3, 37, 8)
    # constant within each packed sample's run of rows
    assert (y == y[:, :, :1, :]).all()
    # across (batch, pack) draws, both kept and dropped occur at rate 0.5
    kept = (y[:, :, 0, 0] != 0)
    assert kept.any() and (~kept).any()


def test_grad_checkpointing_matches_plain():
    """--grad-checkpointing (nn.remat on blocks) must not change values or
    gradients — only the backward's memory schedule."""
    import dataclasses

    import numpy as np
    import optax

    from tpuwsi.models.registry import create_model

    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 32, 32, 3)), jnp.float32
    )
    outs, grads = [], []
    for gc in (False, True):
        model = create_model(
            "vit_tiny_patch16_224", num_classes=2, img_size=32,
            use_pallas_attention=False, dtype=jnp.float32,
            grad_checkpointing=gc,
        )
        assert model.config.remat_blocks == gc
        params = model.init(jax.random.PRNGKey(0), x[:1])

        def loss(p):
            return jnp.sum(model.apply(p, x) ** 2)

        l, g = jax.value_and_grad(loss)(params)
        outs.append(float(l))
        grads.append(g)
    assert np.isclose(outs[0], outs[1], rtol=1e-5)
    flat0 = jnp.concatenate(
        [g.ravel() for g in jax.tree_util.tree_leaves(grads[0])]
    )
    flat1 = jnp.concatenate(
        [g.ravel() for g in jax.tree_util.tree_leaves(grads[1])]
    )
    # remat reorders f32 reductions; allow tiny numeric drift
    np.testing.assert_allclose(
        np.asarray(flat0), np.asarray(flat1), rtol=5e-4, atol=1e-5
    )


def test_bn_momentum_torch_semantics_and_registry_conversion():
    """--bn-momentum is torch-convention (torchvision/timm default 0.1):
    running stats move by (1 - flax_momentum) * batch_stat per step, so a
    5x larger torch momentum must move them ~5x further; the registry
    converts torch -> flax complement and threads --bn-eps through."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpuwsi.models.registry import create_model
    from tpuwsi.models.resnet_trunc import ResNetTruncBaseline

    m = create_model("resnet50", num_classes=2, bn_momentum=0.25, bn_eps=2e-5)
    assert m.bn_momentum == 0.75 and m.bn_eps == 2e-5
    assert create_model("resnet50", num_classes=2).bn_momentum == 0.9

    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 32, 32, 3)), jnp.float32
    )

    def delta(flax_momentum):
        mod = ResNetTruncBaseline(stage_sizes=(1,), num_classes=0,
                                  bn_momentum=flax_momentum)
        v = mod.init(jax.random.PRNGKey(0), x)
        _, mut = mod.apply(v, x, train=True, mutable=["batch_stats"])
        return np.concatenate([
            np.ravel(np.asarray(l)) for l in jax.tree_util.tree_leaves(
                jax.tree_util.tree_map(
                    lambda new, old: new - old,
                    mut["batch_stats"], v["batch_stats"],
                )
            )
        ])

    d_torch01 = delta(0.9)   # torch momentum 0.1
    d_torch05 = delta(0.5)   # torch momentum 0.5
    moved = np.abs(d_torch01) > 1e-6
    assert moved.any()
    np.testing.assert_allclose(
        d_torch05[moved] / d_torch01[moved], 5.0, rtol=1e-3
    )


def test_list_models_all_construct():
    """Registry listing (timm list_models surface): every advertised name
    constructs, and an unknown name errors with the list_models pointer."""
    import pytest

    from tpuwsi.models.registry import create_model, list_models

    names = list_models()
    assert "vit_small_patch16_224_dino" in names  # run-book flagship
    assert "resnet50" in names and "efficientnet_b0" in names
    for n in names:
        create_model(n)
    with pytest.raises(ValueError, match="list_models"):
        create_model("nosuch_model")


def test_efficientnet_droppath_rng_collection():
    """EfficientNet stochastic depth draws from the repo-wide 'droppath'
    collection (same contract as the ViT blocks and the train steps)."""
    import jax
    import numpy as np

    from tpuwsi.models.registry import create_model

    m = create_model("efficientnet_b0", num_classes=2,
                     drop_path_rate=0.5, dtype=jnp.float32)
    x = jnp.asarray(np.random.RandomState(0).rand(4, 32, 32, 3), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    out, _ = m.apply(v, x, train=True, mutable=["batch_stats"],
                     rngs={"droppath": jax.random.PRNGKey(1),
                           "dropout": jax.random.PRNGKey(2)})
    assert np.isfinite(np.asarray(out)).all()


def test_ssl_backbone_name_error_is_vit_specific():
    """parse_model_name (the SSL backbone path) rejects CNN names with a
    ViT-pattern message, not one that lists the name it just rejected."""
    import pytest

    from tpuwsi.models.registry import parse_model_name

    with pytest.raises(ValueError, match="not a ViT model name"):
        parse_model_name("efficientnet_b0")


def test_create_model_attn_save_probs_plumbed():
    """cli.train's supervised path adopts the saved-probs attention backward
    on TPU (scripts/exp_sup4.py) — the registry must thread the flag to the
    ViT config and the CNN families must simply ignore it."""
    from tpuwsi.models.registry import create_model

    m = create_model("vit_small_patch16_224", attn_save_probs=True)
    assert m.config.attn_save_probs
    m = create_model("vit_small_patch16_224")
    assert not m.config.attn_save_probs
    # CNN families accept and ignore the flag
    create_model("resnet50", attn_save_probs=True)
    create_model("efficientnet_b0", attn_save_probs=True)
