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


class _TorchBottleneck(tnn.Module):
    """torchvision-named bottleneck (conv1/bn1/conv2/bn2/conv3/bn3 +
    optional downsample Sequential) — reference forward for the golden test."""

    def __init__(self, inplanes, planes, stride=1, with_down=False,
                 groups=1, base_width=64):
        super().__init__()
        width = int(planes * base_width / 64.0) * groups
        self.conv1 = tnn.Conv2d(inplanes, width, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(width)
        self.conv2 = tnn.Conv2d(width, width, 3, stride=stride, padding=1,
                                groups=groups, bias=False)
        self.bn2 = tnn.BatchNorm2d(width)
        self.conv3 = tnn.Conv2d(width, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.relu = tnn.ReLU()
        self.downsample = None
        if with_down:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(inplanes, planes * 4, 1, stride=stride, bias=False),
                tnn.BatchNorm2d(planes * 4),
            )

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return self.relu(y + idn)


class _TorchTrunc(tnn.Module):
    """ResNet-50 stem + layer1-3 + avgpool, torchvision state_dict naming
    (nn_encoder_arch ResNet_Trunc_Baseline semantics, SURVEY §2.9)."""

    def __init__(self):
        super().__init__()
        import torch

        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU()
        self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)

        def make_layer(inplanes, planes, blocks, stride):
            layers = [_TorchBottleneck(inplanes, planes, stride, True)]
            for _ in range(1, blocks):
                layers.append(_TorchBottleneck(planes * 4, planes))
            return tnn.Sequential(*layers)

        self.layer1 = make_layer(64, 64, 3, 1)
        self.layer2 = make_layer(256, 128, 4, 2)
        self.layer3 = make_layer(512, 256, 6, 2)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer3(self.layer2(self.layer1(x)))
        return x.mean(dim=(2, 3))


def test_resnet_trunc_conversion_golden():
    """VERDICT r2 #9: torch ResNet-50 trunc weights → flax, forward match."""
    import torch

    from tpuwsi.models.convert import torch_resnet_trunc_to_flax
    from tpuwsi.models.resnet_trunc import resnet50_trunc_baseline

    torch.manual_seed(0)
    tmodel = _TorchTrunc().eval()
    # randomize BN running stats so the golden check exercises them
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.6, 1.4)

    model, variables = resnet50_trunc_baseline(
        pretrained=tmodel.state_dict(), dtype=jnp.float32
    )
    x = np.random.RandomState(0).rand(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    out = np.asarray(model.apply(variables, jnp.asarray(x)))
    assert out.shape == (2, 1024)
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)


class _TorchResNet50(_TorchTrunc):
    """Full torchvision-named ResNet-50 (adds layer4 + fc) for the trainable
    classifier golden test (round-3 VERDICT #7)."""

    def __init__(self, num_classes=2):
        super().__init__()

        def make_layer(inplanes, planes, blocks, stride):
            layers = [_TorchBottleneck(inplanes, planes, stride, True)]
            for _ in range(1, blocks):
                layers.append(_TorchBottleneck(planes * 4, planes))
            return tnn.Sequential(*layers)

        self.layer4 = make_layer(1024, 512, 3, 2)
        self.fc = tnn.Linear(2048, num_classes)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        return self.fc(x.mean(dim=(2, 3)))


def test_resnet50_classifier_conversion_golden():
    """Full trainable ResNet-50 (layer4 + fc): torch weights → flax, logits
    match. Parity surface: create_model('resnet50') at train.py:482-495."""
    import torch

    from tpuwsi.models.convert import torch_resnet_trunc_to_flax
    from tpuwsi.models.resnet_trunc import resnet50

    torch.manual_seed(1)
    tmodel = _TorchResNet50(num_classes=2).eval()
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.6, 1.4)

    model = resnet50(num_classes=2, dtype=jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32)
    )
    variables = torch_resnet_trunc_to_flax(tmodel.state_dict(), variables)
    x = np.random.RandomState(1).rand(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    out = np.asarray(model.apply(variables, jnp.asarray(x)))
    assert out.shape == (2, 2)
    np.testing.assert_allclose(out, ref, atol=3e-4, rtol=1e-3)


class _TorchBasicBlock(tnn.Module):
    """torchvision BasicBlock (resnet18/34): two 3x3 convs, expansion 1."""

    def __init__(self, inplanes, planes, stride=1, with_down=False):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 3, stride=stride,
                                padding=1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.relu = tnn.ReLU()
        self.downsample = None
        if with_down:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(inplanes, planes, 1, stride=stride, bias=False),
                tnn.BatchNorm2d(planes),
            )

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return self.relu(y + idn)


class _TorchResNet18(tnn.Module):
    def __init__(self, num_classes=2):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU()
        self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)

        def make_layer(inplanes, planes, blocks, stride, with_down):
            layers = [_TorchBasicBlock(inplanes, planes, stride, with_down)]
            for _ in range(1, blocks):
                layers.append(_TorchBasicBlock(planes, planes))
            return tnn.Sequential(*layers)

        # torchvision resnet18: layer1 has NO downsample (64→64, stride 1)
        self.layer1 = make_layer(64, 64, 2, 1, False)
        self.layer2 = make_layer(64, 128, 2, 2, True)
        self.layer3 = make_layer(128, 256, 2, 2, True)
        self.layer4 = make_layer(256, 512, 2, 2, True)
        self.fc = tnn.Linear(512, num_classes)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        return self.fc(x.mean(dim=(2, 3)))


def test_resnet18_basicblock_conversion_golden():
    """BasicBlock family (resnet18/34): torch weights → flax, logits match —
    pins the 2-conv block geometry, the no-downsample first stage, and the
    geometry-following converter."""
    import torch

    from tpuwsi.models.convert import torch_resnet_trunc_to_flax
    from tpuwsi.models.registry import create_model

    torch.manual_seed(2)
    tmodel = _TorchResNet18(num_classes=3).eval()
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.6, 1.4)

    model = create_model("resnet18", num_classes=3, dtype=jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32)
    )
    variables = torch_resnet_trunc_to_flax(tmodel.state_dict(), variables)
    x = np.random.RandomState(2).rand(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    out = np.asarray(model.apply(variables, jnp.asarray(x)))
    assert out.shape == (2, 3)
    np.testing.assert_allclose(out, ref, atol=3e-4, rtol=1e-3)


def test_resnet_family_geometry():
    """Registry zoo breadth: every torchvision depth builds with the right
    block taxonomy and feature width."""
    import jax

    from tpuwsi.models.registry import create_model

    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    for name, width, n_params_min in (
        ("resnet34", 512, 21_000_000),
        ("resnet101", 2048, 42_000_000),
    ):
        m = create_model(name, num_classes=0, dtype=jnp.float32)
        v = m.init(jax.random.PRNGKey(0), x)
        feats = m.apply(v, x)
        assert feats.shape == (1, width), name
        n = sum(int(np.prod(p.shape))
                for p in jax.tree_util.tree_leaves(v["params"]))
        assert n > n_params_min, (name, n)


class _TorchResNeXt50(tnn.Module):
    """torchvision resnext50_32x4d replica (grouped 3x3 bottleneck convs,
    width rule int(planes*4/64)*32) for the grouped-conv conversion golden."""

    def __init__(self, num_classes=2, groups=32, base_width=4):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU()
        self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)

        def make_layer(inplanes, planes, blocks, stride):
            layers = [_TorchBottleneck(inplanes, planes, stride, True,
                                       groups, base_width)]
            for _ in range(1, blocks):
                layers.append(_TorchBottleneck(planes * 4, planes,
                                               groups=groups,
                                               base_width=base_width))
            return tnn.Sequential(*layers)

        self.layer1 = make_layer(64, 64, 3, 1)
        self.layer2 = make_layer(256, 128, 4, 2)
        self.layer3 = make_layer(512, 256, 6, 2)
        self.layer4 = make_layer(1024, 512, 3, 2)
        self.fc = tnn.Linear(2048, num_classes)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        return self.fc(x.mean(dim=(2, 3)))


def test_resnext_grouped_conversion_golden():
    """resnext50_32x4d: grouped torch conv weights (O, I/g, kh, kw) map to
    flax feature_group_count kernels (kh, kw, I/g, O) through the same
    geometry-following converter; logits match."""
    import torch

    from tpuwsi.models.convert import torch_resnet_trunc_to_flax
    from tpuwsi.models.registry import create_model

    torch.manual_seed(2)
    tmodel = _TorchResNeXt50(num_classes=2).eval()
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.6, 1.4)

    model = create_model("resnext50_32x4d", num_classes=2, dtype=jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32)
    )
    variables = torch_resnet_trunc_to_flax(tmodel.state_dict(), variables)
    x = np.random.RandomState(2).rand(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    out = np.asarray(model.apply(variables, jnp.asarray(x)))
    assert out.shape == (2, 2)
    np.testing.assert_allclose(out, ref, atol=3e-4, rtol=1e-3)


def test_wide_resnext_family_geometry():
    """wide_resnet*_2 / resnext* registry breadth: torchvision param counts
    (sans 1000-class fc) pin the width rule."""
    import jax

    from tpuwsi.models.registry import create_model

    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    # torchvision totals minus the 1000-class fc (2048x1000 + 1000)
    for name, n_backbone in (
        ("wide_resnet50_2", 68_883_240 - 2_049_000),
        ("resnext50_32x4d", 25_028_904 - 2_049_000),
    ):
        m = create_model(name, num_classes=0, dtype=jnp.float32)
        v = m.init(jax.random.PRNGKey(0), x)
        feats = m.apply(v, x)
        assert feats.shape == (1, 2048), name
        n = sum(int(np.prod(p.shape))
                for p in jax.tree_util.tree_leaves(v["params"]))
        assert n == n_backbone, (name, n, n_backbone)


class _TorchSE(tnn.Module):
    def __init__(self, chs, rd):
        super().__init__()
        self.conv_reduce = tnn.Conv2d(chs, rd, 1)
        self.conv_expand = tnn.Conv2d(rd, chs, 1)

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        s = tnn.functional.silu(self.conv_reduce(s))
        return x * self.conv_expand(s).sigmoid()


class _TorchDS(tnn.Module):
    """timm DepthwiseSeparableConv (stage 0)."""

    def __init__(self, in_chs, out_chs, k=3, stride=1):
        super().__init__()
        self.conv_dw = tnn.Conv2d(in_chs, in_chs, k, stride, k // 2,
                                  groups=in_chs, bias=False)
        self.bn1 = tnn.BatchNorm2d(in_chs)
        self.se = _TorchSE(in_chs, max(1, int(in_chs * 0.25)))
        self.conv_pw = tnn.Conv2d(in_chs, out_chs, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(out_chs)
        self.has_res = stride == 1 and in_chs == out_chs

    def forward(self, x):
        sc = x
        x = tnn.functional.silu(self.bn1(self.conv_dw(x)))
        x = self.se(x)
        x = self.bn2(self.conv_pw(x))
        return x + sc if self.has_res else x


class _TorchIR(tnn.Module):
    """timm InvertedResidual (MBConv w/ SE)."""

    def __init__(self, in_chs, out_chs, k=3, stride=1, exp=6):
        super().__init__()
        mid = in_chs * exp
        self.conv_pw = tnn.Conv2d(in_chs, mid, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(mid)
        self.conv_dw = tnn.Conv2d(mid, mid, k, stride, k // 2, groups=mid,
                                  bias=False)
        self.bn2 = tnn.BatchNorm2d(mid)
        self.se = _TorchSE(mid, max(1, int(in_chs * 0.25)))
        self.conv_pwl = tnn.Conv2d(mid, out_chs, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(out_chs)
        self.has_res = stride == 1 and in_chs == out_chs

    def forward(self, x):
        sc = x
        x = tnn.functional.silu(self.bn1(self.conv_pw(x)))
        x = tnn.functional.silu(self.bn2(self.conv_dw(x)))
        x = self.se(x)
        x = self.bn3(self.conv_pwl(x))
        return x + sc if self.has_res else x


class _TorchEffNetB0(tnn.Module):
    """timm efficientnet_b0 replica (state_dict-name-exact) for the golden."""

    def __init__(self, num_classes=2):
        super().__init__()
        self.conv_stem = tnn.Conv2d(3, 32, 3, 2, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(32)
        stages = []
        cfg = [("ds", 1, 3, 1, 1, 16), ("ir", 2, 3, 2, 6, 24),
               ("ir", 2, 5, 2, 6, 40), ("ir", 3, 3, 2, 6, 80),
               ("ir", 3, 5, 1, 6, 112), ("ir", 4, 5, 2, 6, 192),
               ("ir", 1, 3, 1, 6, 320)]
        in_chs = 32
        for btype, reps, k, stride, exp, out in cfg:
            blocks = []
            for r in range(reps):
                s = stride if r == 0 else 1
                if btype == "ds":
                    blocks.append(_TorchDS(in_chs, out, k, s))
                else:
                    blocks.append(_TorchIR(in_chs, out, k, s, exp))
                in_chs = out
            stages.append(tnn.Sequential(*blocks))
        self.blocks = tnn.Sequential(*stages)
        self.conv_head = tnn.Conv2d(320, 1280, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(1280)
        self.classifier = tnn.Linear(1280, num_classes)

    def forward(self, x):
        x = tnn.functional.silu(self.bn1(self.conv_stem(x)))
        x = self.blocks(x)
        x = tnn.functional.silu(self.bn2(self.conv_head(x)))
        return self.classifier(x.mean((2, 3)))


def test_efficientnet_b0_conversion_golden():
    """timm efficientnet_b0: MBConv/SE/SiLU weights → flax, logits match
    (depthwise kernels, SE 1x1s with bias, the DS-vs-IR key asymmetry and
    the in_chs*0.25 SE reduction all pinned)."""
    import torch

    from tpuwsi.models.convert import torch_efficientnet_to_flax
    from tpuwsi.models.registry import create_model

    torch.manual_seed(3)
    tmodel = _TorchEffNetB0(num_classes=2).eval()
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.6, 1.4)

    model = create_model("efficientnet_b0", num_classes=2, dtype=jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32)
    )
    variables = torch_efficientnet_to_flax(tmodel.state_dict(), variables)
    x = np.random.RandomState(3).rand(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    out = np.asarray(model.apply(variables, jnp.asarray(x)))
    assert out.shape == (2, 2)
    np.testing.assert_allclose(out, ref, atol=3e-4, rtol=1e-3)


def test_efficientnet_family_geometry():
    """Compound scaling pins: param counts equal timm totals minus the
    1000-class classifier."""
    import jax

    from tpuwsi.models.registry import create_model

    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    for name, n_backbone, feats in (
        ("efficientnet_b0", 5_288_548 - 1_281_000, 1280),
        ("efficientnet_b2", 9_109_994 - 1_409_000, 1408),
        ("efficientnet_b5", 30_389_784 - 2_049_000, 2048),
    ):
        m = create_model(name, num_classes=0, dtype=jnp.float32)
        v = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(v, x)
        assert out.shape == (1, feats), name
        n = sum(int(np.prod(p.shape))
                for p in jax.tree_util.tree_leaves(v["params"]))
        assert n == n_backbone, (name, n, n_backbone)


def test_flax_vit_to_torch_roundtrip():
    """Reverse exporter: flax params → timm-named torch state_dict →
    torch_vit_to_flax must reproduce the original tree EXACTLY (pins the
    inverse mapping against the golden-tested importer), for both the
    unrolled and scanned block trees, with the head when present."""
    import flax

    from tpuwsi.models.convert import flax_vit_to_torch, torch_vit_to_flax
    from tpuwsi.models.vit import ViTConfig, VisionTransformer

    for scan, classes in ((False, 3), (True, 0)):
        cfg = ViTConfig(img_size=32, patch_size=16, embed_dim=64, depth=2,
                        num_heads=2, num_classes=classes, scan_blocks=scan,
                        dtype=jnp.float32)
        m = VisionTransformer(cfg)
        v0 = m.init(jax.random.PRNGKey(7), jnp.zeros((1, 32, 32, 3)))
        sd = flax_vit_to_torch(v0)
        assert "patch_embed.proj.weight" in sd
        assert sd["patch_embed.proj.weight"].shape == (64, 3, 16, 16)
        assert ("head.weight" in sd) == (classes > 0)
        assert "blocks.1.attn.qkv.weight" in sd
        assert "blocks.2.norm1.weight" not in sd

        if scan:
            # importer targets the unrolled tree; rebuild one to land in
            cfg_u = ViTConfig(img_size=32, patch_size=16, embed_dim=64,
                              depth=2, num_heads=2, num_classes=classes,
                              dtype=jnp.float32)
            target = VisionTransformer(cfg_u).init(
                jax.random.PRNGKey(8), jnp.zeros((1, 32, 32, 3)))
            v1 = torch_vit_to_flax(sd, target)
            # compare forward outputs: scanned original vs unrolled import
            x = jnp.asarray(
                np.random.RandomState(0).rand(2, 32, 32, 3), jnp.float32)
            y0 = np.asarray(m.apply(v0, x))
            y1 = np.asarray(VisionTransformer(cfg_u).apply(v1, x))
            np.testing.assert_allclose(y0, y1, atol=2e-5, rtol=1e-5)
        else:
            v1 = torch_vit_to_flax(sd, v0)
            f0 = flax.traverse_util.flatten_dict(flax.core.unfreeze(v0))
            f1 = flax.traverse_util.flatten_dict(flax.core.unfreeze(v1))
            assert f0.keys() == f1.keys()
            for k in f0:
                np.testing.assert_array_equal(
                    np.asarray(f0[k]), np.asarray(f1[k]), err_msg=str(k))


def test_flax_vit_to_torch_qkv_bias_false():
    """qkv_bias=False trees export without the bias keys (the importer
    treats them as optional; the exporter must mirror that)."""
    from tpuwsi.models.convert import flax_vit_to_torch
    from tpuwsi.models.vit import ViTConfig, VisionTransformer

    cfg = ViTConfig(img_size=32, patch_size=16, embed_dim=64, depth=2,
                    num_heads=2, num_classes=0, qkv_bias=False,
                    dtype=jnp.float32)
    v = VisionTransformer(cfg).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3), jnp.float32))
    sd = flax_vit_to_torch(v)
    assert "blocks.0.attn.qkv.weight" in sd
    assert "blocks.0.attn.qkv.bias" not in sd


def test_efficientnet_conversion_rejects_deeper_source():
    """A deeper-variant state_dict (extra repeats, same widths) must raise,
    not silently drop the extra residual blocks."""
    import pytest
    import torch

    from tpuwsi.models.convert import torch_efficientnet_to_flax
    from tpuwsi.models.registry import create_model

    torch.manual_seed(0)
    tmodel = _TorchEffNetB0(num_classes=2)
    sd = dict(tmodel.state_dict())
    # graft one extra same-width block into stage 0 (what a deeper variant
    # with identical channel widths looks like to the shape checks)
    for k in list(sd):
        if k.startswith("blocks.0.0."):
            sd[k.replace("blocks.0.0.", "blocks.0.1.")] = sd[k].clone()

    model = create_model("efficientnet_b0", num_classes=2, dtype=jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
    with pytest.raises(ValueError, match="not consumed"):
        torch_efficientnet_to_flax(sd, variables)


def test_flax_resnet_to_torch_golden():
    """CNN reverse exporter: a flax resnet18 (randomized BN stats) exports
    to a torchvision-named dict that load_state_dict(strict=True) accepts,
    and the torch forward matches the flax eval forward."""
    import torch

    from tpuwsi.models.convert import flax_resnet_to_torch
    from tpuwsi.models.registry import create_model

    model = create_model("resnet18", num_classes=3, dtype=jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(4), jnp.zeros((1, 64, 64, 3), jnp.float32))
    # randomize the BN stats so the export actually carries them
    import flax as _flax

    flat = _flax.traverse_util.flatten_dict(_flax.core.unfreeze(variables))
    rs = np.random.RandomState(4)
    for k in flat:
        if k[0] == "batch_stats":
            base = 1.0 if k[-1] == "var" else 0.0
            flat[k] = jnp.asarray(
                base + rs.uniform(-0.2, 0.2, flat[k].shape), jnp.float32)
    variables = _flax.traverse_util.unflatten_dict(flat)

    sd = flax_resnet_to_torch(variables)
    tmodel = _TorchResNet18(num_classes=3)
    tmodel.load_state_dict({k: torch.from_numpy(np.array(v))
                            for k, v in sd.items()}, strict=True)
    tmodel.eval()
    x = np.random.RandomState(5).rand(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    out = np.asarray(model.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=3e-4, rtol=1e-3)


def test_flax_resnext_to_torch_golden():
    """Grouped-conv reverse export: a flax resnext50_32x4d round-trips to a
    torchvision-named state_dict (flax (kh,kw,I/g,O) -> torch (O,I/g,kh,kw)
    through the same transpose as dense convs) that load_state_dict
    (strict=True) accepts, with matching logits."""
    import torch

    from tpuwsi.models.convert import flax_resnet_to_torch
    from tpuwsi.models.registry import create_model

    model = create_model("resnext50_32x4d", num_classes=2, dtype=jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(8), jnp.zeros((1, 64, 64, 3), jnp.float32))
    import flax as _flax

    flat = _flax.traverse_util.flatten_dict(_flax.core.unfreeze(variables))
    rs = np.random.RandomState(8)
    for k in flat:
        if k[0] == "batch_stats":
            base = 1.0 if k[-1] == "var" else 0.0
            flat[k] = jnp.asarray(
                base + rs.uniform(-0.2, 0.2, flat[k].shape), jnp.float32)
    variables = _flax.traverse_util.unflatten_dict(flat)

    sd = flax_resnet_to_torch(variables)
    tmodel = _TorchResNeXt50(num_classes=2)
    tmodel.load_state_dict({k: torch.from_numpy(np.array(v))
                            for k, v in sd.items()}, strict=True)
    tmodel.eval()
    x = np.random.RandomState(9).rand(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    out = np.asarray(model.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=3e-4, rtol=1e-3)


def test_flax_efficientnet_to_torch_golden():
    """EfficientNet reverse exporter: strict torch load + forward match."""
    import torch

    from tpuwsi.models.convert import flax_efficientnet_to_torch
    from tpuwsi.models.registry import create_model

    model = create_model("efficientnet_b0", num_classes=2, dtype=jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(6), jnp.zeros((1, 64, 64, 3), jnp.float32))
    sd = flax_efficientnet_to_torch(variables)
    tmodel = _TorchEffNetB0(num_classes=2)
    tmodel.load_state_dict({k: torch.from_numpy(np.array(v))
                            for k, v in sd.items()}, strict=True)
    tmodel.eval()
    x = np.random.RandomState(7).rand(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    out = np.asarray(model.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=3e-4, rtol=1e-3)
