"""Converter test: a timm-named torch ViT state_dict loaded through
torch_vit_to_flax must produce the same outputs as the torch model
(this also pins the conv→GEMM patch-embed layout)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from tpuwsi.models.convert import torch_vit_to_flax  # noqa: E402
from tpuwsi.models.vit import ViTConfig, VisionTransformer  # noqa: E402


class TimmNamedViT(tnn.Module):
    """Conv patch-embed ViT with exact timm parameter names."""

    def __init__(self, img=32, patch=16, dim=64, depth=2, heads=2, classes=3):
        super().__init__()
        self.patch_embed = tnn.Module()
        self.patch_embed.proj = tnn.Conv2d(3, dim, patch, stride=patch)
        self.cls_token = tnn.Parameter(torch.randn(1, 1, dim) * 0.02)
        n = (img // patch) ** 2
        self.pos_embed = tnn.Parameter(torch.randn(1, n + 1, dim) * 0.02)
        self.blocks = tnn.ModuleList()
        self.heads = heads
        self.dim = dim
        for _ in range(depth):
            blk = tnn.Module()
            blk.norm1 = tnn.LayerNorm(dim, eps=1e-6)
            blk.attn = tnn.Module()
            blk.attn.qkv = tnn.Linear(dim, dim * 3)
            blk.attn.proj = tnn.Linear(dim, dim)
            blk.norm2 = tnn.LayerNorm(dim, eps=1e-6)
            blk.mlp = tnn.Module()
            blk.mlp.fc1 = tnn.Linear(dim, dim * 4)
            blk.mlp.fc2 = tnn.Linear(dim * 4, dim)
            self.blocks.append(blk)
        self.norm = tnn.LayerNorm(dim, eps=1e-6)
        self.head = tnn.Linear(dim, classes)

    def forward(self, x):  # x: (B, 3, H, W)
        b = x.shape[0]
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(b, -1, -1), x], dim=1)
        x = x + self.pos_embed
        for blk in self.blocks:
            y = blk.norm1(x)
            qkv = blk.attn.qkv(y).reshape(
                b, -1, 3, self.heads, self.dim // self.heads
            )
            q, k, v = (qkv[:, :, i].transpose(1, 2) for i in range(3))
            s = (q @ k.transpose(-2, -1)) / math.sqrt(self.dim // self.heads)
            y = (torch.softmax(s, -1) @ v).transpose(1, 2).reshape(b, -1, self.dim)
            x = x + blk.attn.proj(y)
            y = blk.norm2(x)
            x = x + blk.mlp.fc2(tnn.functional.gelu(blk.mlp.fc1(y)))
        return self.head(self.norm(x)[:, 0])


def test_timm_checkpoint_conversion_golden():
    torch.manual_seed(1)
    tm = TimmNamedViT()
    cfg = ViTConfig(
        img_size=32, patch_size=16, embed_dim=64, depth=2, num_heads=2,
        num_classes=3, dtype=jnp.float32, use_pallas_attention=False,
    )
    fm = VisionTransformer(cfg)
    x = np.random.RandomState(0).rand(2, 32, 32, 3).astype(np.float32)
    params = fm.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = torch_vit_to_flax(tm.state_dict(), params)

    flax_logits = np.asarray(fm.apply(params, jnp.asarray(x)))
    with torch.no_grad():
        torch_logits = tm(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    np.testing.assert_allclose(flax_logits, torch_logits, atol=1e-5, rtol=1e-5)


def test_conversion_strips_prefixes():
    tm = TimmNamedViT()
    sd = {f"module.backbone.{k}" if False else f"module.{k}": v
          for k, v in tm.state_dict().items()}
    cfg = ViTConfig(img_size=32, patch_size=16, embed_dim=64, depth=2,
                    num_heads=2, num_classes=3, dtype=jnp.float32,
                    use_pallas_attention=False)
    fm = VisionTransformer(cfg)
    params = fm.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    out = torch_vit_to_flax(sd, params)  # should not raise
    assert out is not None


def test_conversion_shape_mismatch_raises():
    tm = TimmNamedViT(dim=64)
    cfg = ViTConfig(img_size=32, patch_size=16, embed_dim=128, depth=2,
                    num_heads=2, num_classes=3, dtype=jnp.float32,
                    use_pallas_attention=False)
    fm = VisionTransformer(cfg)
    params = fm.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    with pytest.raises(ValueError):
        torch_vit_to_flax(tm.state_dict(), params)
