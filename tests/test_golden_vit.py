"""Golden cross-framework test: the flax ViT must match an independent
PyTorch implementation of the same (timm/DINO) geometry when loaded with
identical weights (SURVEY §4: 'golden-value tests for ViT forward vs
reference weights'). timm itself is not installed here, so the torch side is
a from-scratch minimal ViT following the published DINO/timm architecture.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from tpuwsi.models.vit import ViTConfig, VisionTransformer  # noqa: E402


class TorchViT(tnn.Module):
    """Minimal timm/DINO-geometry ViT (pre-norm, cls token, learned pos)."""

    def __init__(self, img=32, patch=16, dim=64, depth=2, heads=2):
        super().__init__()
        self.patch = patch
        self.dim = dim
        self.heads = heads
        n = (img // patch) ** 2
        self.proj = tnn.Linear(patch * patch * 3, dim)
        self.cls = tnn.Parameter(torch.zeros(1, 1, dim))
        self.pos = tnn.Parameter(torch.zeros(1, n + 1, dim))
        self.blocks = tnn.ModuleList()
        for _ in range(depth):
            blk = tnn.ModuleDict(
                {
                    "norm1": tnn.LayerNorm(dim, eps=1e-6),
                    "qkv": tnn.Linear(dim, dim * 3),
                    "attn_proj": tnn.Linear(dim, dim),
                    "norm2": tnn.LayerNorm(dim, eps=1e-6),
                    "fc1": tnn.Linear(dim, dim * 4),
                    "fc2": tnn.Linear(dim * 4, dim),
                }
            )
            self.blocks.append(blk)
        self.norm = tnn.LayerNorm(dim, eps=1e-6)

    def forward(self, x):  # x: (B, H, W, 3)
        b, h, w, _ = x.shape
        p = self.patch
        gh, gw = h // p, w // p
        # space-to-depth patching identical to the flax PatchEmbed
        x = x.reshape(b, gh, p, gw, p, 3).permute(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, gh * gw, p * p * 3)
        x = self.proj(x)
        cls = self.cls.expand(b, -1, -1)
        x = torch.cat([cls, x], dim=1) + self.pos
        for blk in self.blocks:
            y = blk["norm1"](x)
            qkv = blk["qkv"](y).reshape(b, -1, 3, self.heads, self.dim // self.heads)
            q, k, v = (qkv[:, :, i].transpose(1, 2) for i in range(3))
            s = (q @ k.transpose(-2, -1)) / math.sqrt(self.dim // self.heads)
            a = torch.softmax(s, dim=-1)
            y = (a @ v).transpose(1, 2).reshape(b, -1, self.dim)
            x = x + blk["attn_proj"](y)
            y = blk["norm2"](x)
            y = blk["fc2"](tnn.functional.gelu(blk["fc1"](y)))
            x = x + y
        return self.norm(x)[:, 0]


def _copy_weights(tm: TorchViT, params):
    """Write the torch weights into the flax param tree (transposed kernels)."""
    import flax

    flat = flax.traverse_util.flatten_dict(flax.core.unfreeze(params))

    def put(path, tensor):
        flat[path] = jnp.asarray(tensor.detach().numpy())

    put(("params", "patch_embed", "proj", "kernel"), tm.proj.weight.T)
    put(("params", "patch_embed", "proj", "bias"), tm.proj.bias)
    put(("params", "cls_token"), tm.cls)
    put(("params", "pos_embed"), tm.pos)
    for i, blk in enumerate(tm.blocks):
        base = ("params", f"blocks_{i}")
        put(base + ("norm1", "scale"), blk["norm1"].weight)
        put(base + ("norm1", "bias"), blk["norm1"].bias)
        put(base + ("attn", "qkv", "kernel"), blk["qkv"].weight.T)
        put(base + ("attn", "qkv", "bias"), blk["qkv"].bias)
        put(base + ("attn", "proj", "kernel"), blk["attn_proj"].weight.T)
        put(base + ("attn", "proj", "bias"), blk["attn_proj"].bias)
        put(base + ("norm2", "scale"), blk["norm2"].weight)
        put(base + ("norm2", "bias"), blk["norm2"].bias)
        put(base + ("mlp", "fc1", "kernel"), blk["fc1"].weight.T)
        put(base + ("mlp", "fc1", "bias"), blk["fc1"].bias)
        put(base + ("mlp", "fc2", "kernel"), blk["fc2"].weight.T)
        put(base + ("mlp", "fc2", "bias"), blk["fc2"].bias)
    put(("params", "norm", "scale"), tm.norm.weight)
    put(("params", "norm", "bias"), tm.norm.bias)
    return flax.traverse_util.unflatten_dict(flat)


def test_flax_vit_matches_torch_golden():
    torch.manual_seed(0)
    tm = TorchViT()
    for p in tm.parameters():
        if p.dim() > 1:
            tnn.init.normal_(p, std=0.05)
        else:
            tnn.init.normal_(p, std=0.02)

    cfg = ViTConfig(
        img_size=32, patch_size=16, embed_dim=64, depth=2, num_heads=2,
        num_classes=0, dtype=jnp.float32, use_pallas_attention=False,
    )
    fm = VisionTransformer(cfg)
    x_np = np.random.RandomState(0).rand(2, 32, 32, 3).astype(np.float32)
    params = fm.init(jax.random.PRNGKey(0), jnp.asarray(x_np))
    params = _copy_weights(tm, params)

    flax_out = np.asarray(fm.apply(params, jnp.asarray(x_np)))
    with torch.no_grad():
        torch_out = tm(torch.from_numpy(x_np)).numpy()
    np.testing.assert_allclose(flax_out, torch_out, atol=1e-5, rtol=1e-5)
