#!/usr/bin/env python
"""On-chip smoke + rate for the trainable-CNN families (supervised step).

The reference trains any timm CNN by name (create_model(args.model, ...),
/root/reference/train.py:482-495; timm_train.py:357). tpuwsi's CNN zoo
(resnets incl. wide/resnext, efficientnet_b0..b7) is golden-tested and
CLI-tested on the CPU mesh, but the conv paths (NHWC depthwise convs,
grouped convs, BatchNorm batch_stats threading through the scanned
driver) had never executed on real TPU hardware until this script.

Per model: build the production supervised step (on-device 'flip' recipe,
SGD+momentum, batch_stats threading), scan K steps per dispatch
(make_multi_step, same driver as --steps-per-dispatch), keep the
super-batch device-resident (the ~40 MB/s tunnel would otherwise dominate),
fetch the loss (this backend needs a fetch, not block_until_ready), and
print one JSON line with tiles/s.

Usage: python scripts/bench_cnn.py [batch=64] [K=8] [model ...]
"""

import json
import sys
import time

import jax

sys.path.insert(0, "/root/repo")
from tpuwsi.core.compile import machine_cache_dir  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir", machine_cache_dir("/root/repo/.jax_cache")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402


def bench_model(name: str, batch: int, K: int, tile: int = 256):
    from tpuwsi.models.registry import create_model
    from tpuwsi.preprocess.recipes import make_recipe
    from tpuwsi.train.state import create_train_state
    from tpuwsi.train.supervised import make_multi_step, make_train_step

    model = create_model(name, num_classes=2)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, tile, tile, 3), jnp.float32)
    )
    batch_stats = variables.get("batch_stats")
    params = (
        {"params": variables["params"]} if batch_stats is not None
        else variables
    )
    tx = optax.sgd(1e-2, momentum=0.9)
    state = create_train_state(params, tx, batch_stats=batch_stats)

    step = make_train_step(
        model.apply, tx,
        augment_fn=make_recipe("flip", train=True, tile_size=tile),
        compute_auc=False,
        use_batch_stats=batch_stats is not None,
    )
    multi = jax.jit(make_multi_step(step))

    rng = np.random.default_rng(0)
    host = rng.integers(0, 256, (K, batch, tile, tile, 3), dtype=np.uint8)
    labels = np.asarray(rng.integers(0, 2, (K, batch)), np.int32)
    batches = {
        "images": jax.device_put(host),
        "labels": jax.device_put(labels),
    }
    key = jax.random.PRNGKey(1)

    t0 = time.time()
    state, metrics = multi(state, batches, key)
    loss0 = float(metrics["loss"])  # fetch = the only honest sync here
    compile_s = time.time() - t0
    assert np.isfinite(loss0), (name, loss0)

    times = []
    for _ in range(3):
        t0 = time.time()
        state, metrics = multi(state, batches, key)
        loss = float(metrics["loss"])
        times.append(time.time() - t0)
    assert np.isfinite(loss), (name, loss)
    if batch_stats is not None:
        # BN running stats must actually move on device
        m0 = jax.tree_util.tree_leaves(batch_stats)[0]
        m1 = jax.tree_util.tree_leaves(state.batch_stats)[0]
        assert not np.allclose(np.asarray(m0), np.asarray(m1)), name

    dt = min(times)
    print(json.dumps({
        "metric": f"supervised_tiles_per_sec_{name}",
        "value": round(K * batch / dt, 1),
        "unit": f"{tile}x{tile} tiles/sec/chip (fwd+bwd+BN, b{batch} K{K})",
        "step_ms": round(dt / K * 1e3, 2),
        "first_loss": round(loss0, 4),
        "compile_s": round(compile_s, 1),
        "backend": jax.default_backend(),
    }), flush=True)


def main():
    argv = sys.argv[1:]
    batch = int(argv[0]) if len(argv) > 0 else 64
    K = int(argv[1]) if len(argv) > 1 else 8
    models = argv[2:] or ["resnet50", "efficientnet_b0"]
    for name in models:
        bench_model(name, batch, K)


if __name__ == "__main__":
    main()
