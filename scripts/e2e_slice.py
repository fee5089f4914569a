#!/usr/bin/env python
"""E2E training-slice verification on the real TPU (verify skill surface 4).

Builds a tiny bright-vs-dark ImageFolder, trains ViT-T(depth=4) with the
'flip' recipe for ~50 steps through the supervised train step, asserts the
loss falls and held-out AUC reaches 1.0.
"""

import atexit
import os
import shutil
import sys
import tempfile

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from PIL import Image

sys.path.insert(0, "/root/repo")


def main():
    from tpuwsi.models.vit import ViTConfig, VisionTransformer
    from tpuwsi.preprocess.recipes import make_recipe
    from tpuwsi.train import OptimConfig, make_optimizer
    from tpuwsi.train.state import TrainState, create_train_state
    from tpuwsi.train.supervised import make_train_step

    rng = np.random.default_rng(0)
    root = tempfile.mkdtemp(prefix="e2e_slice_")
    atexit.register(shutil.rmtree, root, True)  # no /tmp litter on the bench host
    for cls, base in (("bright", 200), ("dark", 40)):
        os.makedirs(f"{root}/{cls}", exist_ok=True)
        for i in range(32):
            arr = np.clip(
                rng.normal(base, 15, (64, 64, 3)), 0, 255
            ).astype(np.uint8)
            Image.fromarray(arr).save(f"{root}/{cls}/{i}.png")

    cfg = ViTConfig(
        img_size=64, patch_size=16, embed_dim=96, depth=4, num_heads=3,
        num_classes=2, gelu_approx=True,
        use_pallas_attention=jax.default_backend() == "tpu",
    )
    model = VisionTransformer(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 64, 64, 3), jnp.float32))
    tx, _ = make_optimizer(OptimConfig(opt="adamw", lr=1e-3), params,
                           global_batch_size=32)
    state = create_train_state(params, tx)
    step = jax.jit(make_train_step(model.apply, tx))
    recipe = make_recipe("flip", train=True, tile_size=64)

    # data: all PNGs, labels by folder
    xs, ys = [], []
    for li, cls in enumerate(("bright", "dark")):
        for i in range(32):
            xs.append(np.asarray(Image.open(f"{root}/{cls}/{i}.png")))
            ys.append(li)
    xs = np.stack(xs)
    ys = np.asarray(ys, np.int32)
    tr = np.concatenate([np.arange(0, 24), np.arange(32, 56)])
    te = np.concatenate([np.arange(24, 32), np.arange(56, 64)])

    key = jax.random.PRNGKey(1)
    losses = []
    for it in range(50):
        idx = rng.choice(tr, size=32, replace=False)
        key, k1, k2 = jax.random.split(key, 3)
        imgs = recipe(k1, jnp.asarray(xs[idx]))
        state, m = step(state, {"images": imgs,
                                "labels": jnp.asarray(ys[idx])}, k2)
        losses.append(float(m["loss"]))

    eval_recipe = make_recipe("flip", train=False, tile_size=64)
    key, k = jax.random.split(key)
    logits = model.apply(state.params, eval_recipe(k, jnp.asarray(xs[te])),
                         deterministic=True)
    scores = np.asarray(jax.nn.softmax(logits, axis=-1))[:, 1]
    lab = ys[te]
    pos, neg = scores[lab == 1], scores[lab == 0]
    auc = float((pos[:, None] > neg[None, :]).mean())
    print(f"loss: {losses[0]:.4f} -> {losses[-1]:.4f}  AUC: {auc:.3f}")
    assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])
    assert auc == 1.0, auc
    print("e2e slice OK")


if __name__ == "__main__":
    main()
