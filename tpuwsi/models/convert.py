"""Torch checkpoint conversion (timm / DINO ViT → tpuwsi flax params).

The reference trains timm ViTs (train.py:482-495) and its SSL recipe starts
from timm's DINO-pretrained ViT-S (train_instruct.txt:17,20). This converter
maps a torch ``state_dict`` with timm/DINO naming onto the tpuwsi parameter
tree so reference users can carry their checkpoints over:

  patch_embed.proj.{weight,bias}  (conv OIHW)  → patch_embed/proj (GEMM)
  cls_token, pos_embed                          → same
  blocks.N.norm1/attn.qkv/attn.proj/norm2/mlp.fc1/mlp.fc2
  norm.{weight,bias}                            → norm
  head.{weight,bias}                            → head (when present)

Weight-layout notes: torch Linear stores (out, in) — transposed here; the
patch-embed conv kernel (D, 3, p, p) is re-laid-out to match the
space-to-depth GEMM ordering (p, p, 3) → flattened (p*p*3, D).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np


def _to_np(t):
    # NOTE: np.array (copy), not .numpy() alone — jnp.asarray on the CPU
    # backend zero-copies aligned numpy buffers, which would alias the LIVE
    # torch tensors (later torch optimizer steps would silently mutate the
    # converted flax params).
    try:
        return np.array(t.detach().cpu().numpy())
    except AttributeError:
        return np.array(t)


def torch_vit_to_flax(state_dict: Dict, params):
    """Returns a new flax param tree with weights from the torch state_dict.

    ``params`` is an initialized tpuwsi VisionTransformer variables dict
    (provides the target structure/shapes). Missing torch keys keep their
    initialized values; shape mismatches raise.
    """
    import flax

    sd = {k: _to_np(v) for k, v in state_dict.items()}
    # strip common prefixes (DDP 'module.', DINO 'backbone.')
    def strip(k):
        for pre in ("module.", "backbone."):
            if k.startswith(pre):
                k = k[len(pre):]
        return k

    sd = {strip(k): v for k, v in sd.items()}

    flat = flax.traverse_util.flatten_dict(flax.core.unfreeze(params))

    def put(path, value):
        if path not in flat:
            raise KeyError(f"no target param at {'/'.join(path)}")
        target = flat[path]
        value = jnp.asarray(value, dtype=target.dtype)
        if value.shape != target.shape:
            raise ValueError(
                f"shape mismatch at {'/'.join(path)}: "
                f"{value.shape} vs {target.shape}"
            )
        flat[path] = value

    if "patch_embed.proj.weight" in sd:
        w = sd["patch_embed.proj.weight"]  # (D, 3, p, p) conv OIHW
        d = w.shape[0]
        # space-to-depth GEMM expects input flattened as (p, p, 3):
        # kernel (p*p*3, D) with the SAME (row-major p,p,c) ordering.
        w = np.transpose(w, (2, 3, 1, 0)).reshape(-1, d)
        put(("params", "patch_embed", "proj", "kernel"), w)
        put(("params", "patch_embed", "proj", "bias"),
            sd["patch_embed.proj.bias"])
    if "cls_token" in sd:
        put(("params", "cls_token"), sd["cls_token"])
    if "pos_embed" in sd:
        put(("params", "pos_embed"), sd["pos_embed"])

    i = 0
    while f"blocks.{i}.norm1.weight" in sd:
        base = ("params", f"blocks_{i}")
        put(base + ("norm1", "scale"), sd[f"blocks.{i}.norm1.weight"])
        put(base + ("norm1", "bias"), sd[f"blocks.{i}.norm1.bias"])
        put(base + ("attn", "qkv", "kernel"), sd[f"blocks.{i}.attn.qkv.weight"].T)
        if f"blocks.{i}.attn.qkv.bias" in sd:
            put(base + ("attn", "qkv", "bias"), sd[f"blocks.{i}.attn.qkv.bias"])
        put(base + ("attn", "proj", "kernel"),
            sd[f"blocks.{i}.attn.proj.weight"].T)
        put(base + ("attn", "proj", "bias"), sd[f"blocks.{i}.attn.proj.bias"])
        put(base + ("norm2", "scale"), sd[f"blocks.{i}.norm2.weight"])
        put(base + ("norm2", "bias"), sd[f"blocks.{i}.norm2.bias"])
        put(base + ("mlp", "fc1", "kernel"), sd[f"blocks.{i}.mlp.fc1.weight"].T)
        put(base + ("mlp", "fc1", "bias"), sd[f"blocks.{i}.mlp.fc1.bias"])
        put(base + ("mlp", "fc2", "kernel"), sd[f"blocks.{i}.mlp.fc2.weight"].T)
        put(base + ("mlp", "fc2", "bias"), sd[f"blocks.{i}.mlp.fc2.bias"])
        i += 1

    if "norm.weight" in sd:
        put(("params", "norm", "scale"), sd["norm.weight"])
        put(("params", "norm", "bias"), sd["norm.bias"])
    if "head.weight" in sd and ("params", "head", "kernel") in flat:
        put(("params", "head", "kernel"), sd["head.weight"].T)
        put(("params", "head", "bias"), sd["head.bias"])

    return flax.traverse_util.unflatten_dict(flat)


def load_torch_checkpoint(path: str):
    """Loads a torch checkpoint file → state_dict (handles the usual
    {'state_dict'|'model'|'teacher'|'student': ...} wrappers)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict):
        for key in ("state_dict", "model", "teacher", "student"):
            if key in ckpt and isinstance(ckpt[key], dict):
                return ckpt[key]
    return ckpt


def torch_resnet_trunc_to_flax(state_dict: Dict, variables):
    """torchvision-named ResNet-50 state_dict → ResNetTruncBaseline variables.

    Parity: the reference's ``resnet50_trunc_baseline(pretrained=True)``
    loads torchvision resnet50 weights via model_zoo (SURVEY §2.9,
    nn_encoder_arch/resnet_trunc); the truncated trunk uses conv1/bn1 +
    layer1-3 only — layer4/fc entries in the state_dict are ignored.

    Layout: conv OIHW → flax HWIO; BatchNorm weight/bias → scale/bias and
    running_mean/var → batch_stats mean/var.
    """
    import flax

    sd = {k: _to_np(v) for k, v in state_dict.items()}
    flat = flax.traverse_util.flatten_dict(flax.core.unfreeze(variables))

    def put(path, value):
        if path not in flat:
            raise KeyError(f"no target param at {'/'.join(path)}")
        target = flat[path]
        value = jnp.asarray(value, dtype=target.dtype)
        if value.shape != target.shape:
            raise ValueError(
                f"shape mismatch at {'/'.join(path)}: "
                f"{value.shape} vs {target.shape}"
            )
        flat[path] = value

    def put_conv(torch_key, flax_path):
        w = sd[torch_key]  # (O, I, H, W)
        put(flax_path + ("kernel",), np.transpose(w, (2, 3, 1, 0)))

    def put_bn(torch_prefix, flax_name, parent):
        put(("params",) + parent + (flax_name, "scale"),
            sd[f"{torch_prefix}.weight"])
        put(("params",) + parent + (flax_name, "bias"),
            sd[f"{torch_prefix}.bias"])
        put(("batch_stats",) + parent + (flax_name, "mean"),
            sd[f"{torch_prefix}.running_mean"])
        put(("batch_stats",) + parent + (flax_name, "var"),
            sd[f"{torch_prefix}.running_var"])

    put_conv("conv1.weight", ("params", "conv1"))
    put_bn("bn1", "bn1", ())

    # Geometry follows the TARGET tree: stages/blocks are whatever
    # layer{s}_{b} entries exist (trunk = layer1-3, full classifiers =
    # layer1-4 of any torchvision depth), and convs-per-block is read off
    # the block (3 = Bottleneck resnet50/101/152, 2 = BasicBlock
    # resnet18/34). Extra state_dict entries (e.g. layer4/fc for the
    # trunk) are ignored.
    stage = 1
    while ("params", f"layer{stage}_0", "Conv_0", "kernel") in flat:
        b = 0
        while ("params", f"layer{stage}_{b}", "Conv_0", "kernel") in flat:
            t = f"layer{stage}.{b}"
            parent = (f"layer{stage}_{b}",)
            n_convs = 3 if ("params",) + parent + ("Conv_2",
                                                   "kernel") in flat else 2
            for ci in range(n_convs):
                put_conv(f"{t}.conv{ci + 1}.weight",
                         ("params",) + parent + (f"Conv_{ci}",))
                put_bn(f"{t}.bn{ci + 1}", f"BatchNorm_{ci}", parent)
            if f"{t}.downsample.0.weight" in sd:
                put_conv(f"{t}.downsample.0.weight",
                         ("params",) + parent + ("downsample_conv",))
                put_bn(f"{t}.downsample.1", "downsample_bn", parent)
            b += 1
        stage += 1

    if ("params", "fc", "kernel") in flat and "fc.weight" in sd:
        # torch Linear (O, I) → flax Dense (I, O); shape check in put()
        # guards classifier-size mismatches loudly
        put(("params", "fc", "kernel"), np.transpose(sd["fc.weight"]))
        put(("params", "fc", "bias"), sd["fc.bias"])

    return flax.traverse_util.unflatten_dict(flat)


def torch_efficientnet_to_flax(state_dict: Dict, variables):
    """timm EfficientNet state_dict → flax variables (models/efficientnet).

    Parity: the reference trains any timm model by name
    (train.py:482-495); timm naming is conv_stem/bn1,
    blocks.{stage}.{idx}.{conv_pw,bn1,conv_dw,bn2,se.conv_reduce,
    se.conv_expand,conv_pwl,bn3} (InvertedResidual) or
    {conv_dw,bn1,se.*,conv_pw,bn2} (DepthwiseSeparable, stage 0),
    conv_head/bn2/classifier. Geometry follows the TARGET tree — any
    width/depth variant converts. Depthwise torch kernels (C,1,k,k)
    transpose to flax (k,k,1,C) with the same OIHW→HWIO rule.
    """
    import flax

    sd = {k: _to_np(v) for k, v in state_dict.items()}
    flat = flax.traverse_util.flatten_dict(flax.core.unfreeze(variables))
    consumed = set()

    def take(key):
        consumed.add(key)
        return sd[key]

    def put(path, value):
        if path not in flat:
            raise KeyError(f"no target param at {'/'.join(path)}")
        target = flat[path]
        value = jnp.asarray(value, dtype=target.dtype)
        if value.shape != target.shape:
            raise ValueError(
                f"shape mismatch at {'/'.join(path)}: "
                f"{value.shape} vs {target.shape}"
            )
        flat[path] = value

    def put_conv(torch_key, flax_path, bias=False):
        put(flax_path + ("kernel",),
            np.transpose(take(torch_key + ".weight"), (2, 3, 1, 0)))
        if bias:
            put(flax_path + ("bias",), take(torch_key + ".bias"))

    def put_bn(torch_prefix, flax_name, parent):
        put(("params",) + parent + (flax_name, "scale"),
            take(f"{torch_prefix}.weight"))
        put(("params",) + parent + (flax_name, "bias"),
            take(f"{torch_prefix}.bias"))
        put(("batch_stats",) + parent + (flax_name, "mean"),
            take(f"{torch_prefix}.running_mean"))
        put(("batch_stats",) + parent + (flax_name, "var"),
            take(f"{torch_prefix}.running_var"))

    put_conv("conv_stem", ("params", "conv_stem"))
    put_bn("bn1", "bn1", ())

    s = 0
    while ("params", f"blocks_{s}_0", "conv_dw", "kernel") in flat:
        b = 0
        while ("params", f"blocks_{s}_{b}", "conv_dw", "kernel") in flat:
            t = f"blocks.{s}.{b}"
            parent = (f"blocks_{s}_{b}",)
            ir = ("params",) + parent + ("conv_pwl", "kernel") in flat
            if ir:  # InvertedResidual: pw-expand, dw, se, pwl
                put_conv(f"{t}.conv_pw", ("params",) + parent + ("conv_pw",))
                put_bn(f"{t}.bn1", "bn1", parent)
                put_conv(f"{t}.conv_dw", ("params",) + parent + ("conv_dw",))
                put_bn(f"{t}.bn2", "bn2", parent)
                put_conv(f"{t}.conv_pwl", ("params",) + parent + ("conv_pwl",))
                put_bn(f"{t}.bn3", "bn3", parent)
            else:  # DepthwiseSeparable: dw, se, pw-project
                put_conv(f"{t}.conv_dw", ("params",) + parent + ("conv_dw",))
                put_bn(f"{t}.bn1", "bn1", parent)
                put_conv(f"{t}.conv_pw", ("params",) + parent + ("conv_pw",))
                put_bn(f"{t}.bn2", "bn2", parent)
            put_conv(f"{t}.se.conv_reduce",
                     ("params",) + parent + ("se", "conv_reduce"), bias=True)
            put_conv(f"{t}.se.conv_expand",
                     ("params",) + parent + ("se", "conv_expand"), bias=True)
            b += 1
        s += 1

    # a deeper-variant source (e.g. b1 weights into a b0 target: same
    # channel widths, extra repeats) would otherwise convert "successfully"
    # with whole residual blocks silently dropped
    extra = sorted(
        k for k in sd
        if k.startswith("blocks.") and k not in consumed
        and not k.endswith("num_batches_tracked")
    )
    if extra:
        raise ValueError(
            f"{len(extra)} source block params were not consumed (e.g. "
            f"{extra[0]!r}) — the torch state_dict has more blocks than "
            "this EfficientNet variant; build the matching variant "
            "(models.registry.create_model) before converting"
        )

    put_conv("conv_head", ("params", "conv_head"))
    put_bn("bn2", "bn2", ())
    if ("params", "classifier", "kernel") in flat and "classifier.weight" in sd:
        put(("params", "classifier", "kernel"),
            np.transpose(sd["classifier.weight"]))
        put(("params", "classifier", "bias"), sd["classifier.bias"])

    return flax.traverse_util.unflatten_dict(flat)


def flax_vit_to_torch(variables) -> Dict:
    """tpuwsi flax ViT params → timm/DINO-named torch state_dict (numpy).

    The inverse of ``torch_vit_to_flax``: lets a tpuwsi-trained backbone
    flow BACK to the reference's torch/timm ecosystem (e.g. evaluating a
    TPU-trained DINO backbone with the reference's own MIL tooling —
    train.py:482-495 loads by these names). Values are float32 numpy
    arrays in torch layouts; wrap with ``torch.from_numpy`` before
    ``load_state_dict``. Handles both the unrolled (``blocks_{i}``) and
    scanned (``blocks_scan``, stacked leading depth axis) parameter trees.
    """
    import flax

    flat = flax.traverse_util.flatten_dict(flax.core.unfreeze(variables))

    def get(*path):
        # np.array (copy): torch.from_numpy on jax's read-only buffers
        # warns and would alias device memory semantics
        return np.array(flat[path], dtype=np.float32)

    sd = {}
    k = get("params", "patch_embed", "proj", "kernel")  # (p*p*3, D)
    d = k.shape[1]
    p = int(round((k.shape[0] // 3) ** 0.5))
    if p * p * 3 != k.shape[0]:
        raise ValueError(f"patch-embed kernel rows {k.shape[0]} != p*p*3")
    # (p*p*3, D) laid out row-major (p, p, 3) → conv OIHW (D, 3, p, p)
    sd["patch_embed.proj.weight"] = np.transpose(
        k.reshape(p, p, 3, d), (3, 2, 0, 1)
    ).copy()
    sd["patch_embed.proj.bias"] = get("params", "patch_embed", "proj", "bias")
    sd["cls_token"] = get("params", "cls_token")
    sd["pos_embed"] = get("params", "pos_embed")

    def export_block(i, leaf):
        """leaf(*path) → np array or None (absent params — e.g. a
        qkv_bias=False tree, mirroring the importer's optional handling)."""
        def emit(torch_key, *path, transpose=False):
            v = leaf(*path)
            if v is not None:
                sd[torch_key] = v.T.copy() if transpose else v

        emit(f"blocks.{i}.norm1.weight", "norm1", "scale")
        emit(f"blocks.{i}.norm1.bias", "norm1", "bias")
        emit(f"blocks.{i}.attn.qkv.weight", "attn", "qkv", "kernel",
             transpose=True)
        emit(f"blocks.{i}.attn.qkv.bias", "attn", "qkv", "bias")
        emit(f"blocks.{i}.attn.proj.weight", "attn", "proj", "kernel",
             transpose=True)
        emit(f"blocks.{i}.attn.proj.bias", "attn", "proj", "bias")
        emit(f"blocks.{i}.norm2.weight", "norm2", "scale")
        emit(f"blocks.{i}.norm2.bias", "norm2", "bias")
        emit(f"blocks.{i}.mlp.fc1.weight", "mlp", "fc1", "kernel",
             transpose=True)
        emit(f"blocks.{i}.mlp.fc1.bias", "mlp", "fc1", "bias")
        emit(f"blocks.{i}.mlp.fc2.weight", "mlp", "fc2", "kernel",
             transpose=True)
        emit(f"blocks.{i}.mlp.fc2.bias", "mlp", "fc2", "bias")

    if ("params", "blocks_scan", "norm1", "scale") in flat:
        # copy each stacked (depth, ...) leaf ONCE, then slice per block
        # (per-block get() would memcpy the whole stack depth times)
        stacked = {
            k[2:]: np.array(v, dtype=np.float32)
            for k, v in flat.items() if k[:2] == ("params", "blocks_scan")
        }
        depth = stacked[("norm1", "scale")].shape[0]
        for i in range(depth):
            export_block(i, lambda *path, _i=i: (
                stacked[path][_i] if path in stacked else None))
    else:
        i = 0
        while ("params", f"blocks_{i}", "norm1", "scale") in flat:
            def leaf(*path, _i=i):
                full = ("params", f"blocks_{_i}") + path
                return get(*full) if full in flat else None

            export_block(i, leaf)
            i += 1

    sd["norm.weight"] = get("params", "norm", "scale")
    sd["norm.bias"] = get("params", "norm", "bias")
    if ("params", "head", "kernel") in flat:
        sd["head.weight"] = get("params", "head", "kernel").T.copy()
        sd["head.bias"] = get("params", "head", "bias")
    return sd


def _export_helpers(variables):
    """Shared scaffolding for the CNN flax→torch exporters: flattened tree +
    conv/bn emitters (flax HWIO → torch OIHW; BN scale/bias/mean/var →
    weight/bias/running_mean/running_var + a zero num_batches_tracked so
    torchvision/timm ``load_state_dict(strict=True)`` accepts the dict)."""
    import flax

    flat = flax.traverse_util.flatten_dict(flax.core.unfreeze(variables))
    sd = {}

    def get(path):
        return np.array(flat[path], dtype=np.float32)

    def emit_conv(torch_key, flax_path, bias=False):
        sd[torch_key + ".weight"] = np.transpose(
            get(flax_path + ("kernel",)), (3, 2, 0, 1)).copy()
        if bias:
            sd[torch_key + ".bias"] = get(flax_path + ("bias",))

    def emit_bn(torch_prefix, flax_name, parent):
        sd[f"{torch_prefix}.weight"] = get(
            ("params",) + parent + (flax_name, "scale"))
        sd[f"{torch_prefix}.bias"] = get(
            ("params",) + parent + (flax_name, "bias"))
        sd[f"{torch_prefix}.running_mean"] = get(
            ("batch_stats",) + parent + (flax_name, "mean"))
        sd[f"{torch_prefix}.running_var"] = get(
            ("batch_stats",) + parent + (flax_name, "var"))
        sd[f"{torch_prefix}.num_batches_tracked"] = np.array(0, np.int64)

    return flat, sd, get, emit_conv, emit_bn


def flax_resnet_to_torch(variables) -> Dict:
    """tpuwsi flax ResNet family → torchvision-named state_dict (numpy).

    Inverse of ``torch_resnet_trunc_to_flax`` for the trainable classifiers
    (resnet18..152, wide/resnext — geometry read off the tree) AND the
    truncated trunk (layer1-3 only). Requires ``batch_stats`` in
    ``variables`` (BN running stats are part of a torch checkpoint).
    """
    flat, sd, get, emit_conv, emit_bn = _export_helpers(variables)
    if ("batch_stats",) not in {k[:1] for k in flat}:
        raise ValueError("variables must include batch_stats (BN running "
                         "stats) — pass the full checkpoint tree")

    emit_conv("conv1", ("params", "conv1"))
    emit_bn("bn1", "bn1", ())
    stage = 1
    while ("params", f"layer{stage}_0", "Conv_0", "kernel") in flat:
        b = 0
        while ("params", f"layer{stage}_{b}", "Conv_0", "kernel") in flat:
            t = f"layer{stage}.{b}"
            parent = (f"layer{stage}_{b}",)
            n_convs = 3 if ("params",) + parent + ("Conv_2",
                                                   "kernel") in flat else 2
            for ci in range(n_convs):
                emit_conv(f"{t}.conv{ci + 1}",
                          ("params",) + parent + (f"Conv_{ci}",))
                emit_bn(f"{t}.bn{ci + 1}", f"BatchNorm_{ci}", parent)
            if ("params",) + parent + ("downsample_conv", "kernel") in flat:
                emit_conv(f"{t}.downsample.0",
                          ("params",) + parent + ("downsample_conv",))
                emit_bn(f"{t}.downsample.1", "downsample_bn", parent)
            b += 1
        stage += 1

    if ("params", "fc", "kernel") in flat:
        sd["fc.weight"] = get(("params", "fc", "kernel")).T.copy()
        sd["fc.bias"] = get(("params", "fc", "bias"))
    return sd


def flax_efficientnet_to_torch(variables) -> Dict:
    """tpuwsi flax EfficientNet → timm-named state_dict (numpy).

    Inverse of ``torch_efficientnet_to_flax``; geometry (stages/repeats,
    DS-vs-IR block kind) read off the tree. Requires ``batch_stats``.
    """
    flat, sd, get, emit_conv, emit_bn = _export_helpers(variables)
    if ("batch_stats",) not in {k[:1] for k in flat}:
        raise ValueError("variables must include batch_stats (BN running "
                         "stats) — pass the full checkpoint tree")

    emit_conv("conv_stem", ("params", "conv_stem"))
    emit_bn("bn1", "bn1", ())
    s = 0
    while ("params", f"blocks_{s}_0", "conv_dw", "kernel") in flat:
        b = 0
        while ("params", f"blocks_{s}_{b}", "conv_dw", "kernel") in flat:
            t = f"blocks.{s}.{b}"
            parent = (f"blocks_{s}_{b}",)
            ir = ("params",) + parent + ("conv_pwl", "kernel") in flat
            if ir:
                emit_conv(f"{t}.conv_pw", ("params",) + parent + ("conv_pw",))
                emit_bn(f"{t}.bn1", "bn1", parent)
                emit_conv(f"{t}.conv_dw", ("params",) + parent + ("conv_dw",))
                emit_bn(f"{t}.bn2", "bn2", parent)
                emit_conv(f"{t}.conv_pwl",
                          ("params",) + parent + ("conv_pwl",))
                emit_bn(f"{t}.bn3", "bn3", parent)
            else:
                emit_conv(f"{t}.conv_dw", ("params",) + parent + ("conv_dw",))
                emit_bn(f"{t}.bn1", "bn1", parent)
                emit_conv(f"{t}.conv_pw", ("params",) + parent + ("conv_pw",))
                emit_bn(f"{t}.bn2", "bn2", parent)
            emit_conv(f"{t}.se.conv_reduce",
                      ("params",) + parent + ("se", "conv_reduce"), bias=True)
            emit_conv(f"{t}.se.conv_expand",
                      ("params",) + parent + ("se", "conv_expand"), bias=True)
            b += 1
        s += 1

    emit_conv("conv_head", ("params", "conv_head"))
    emit_bn("bn2", "bn2", ())
    if ("params", "classifier", "kernel") in flat:
        sd["classifier.weight"] = get(("params", "classifier", "kernel")).T.copy()
        sd["classifier.bias"] = get(("params", "classifier", "bias"))
    return sd
