"""--steps-per-dispatch: the scanned multi-step driver must be bit-equivalent
to N single-step dispatches (same rng folding via state.step), unit-level and
through the CLI."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from tpuwsi.models.vit import ViTConfig, VisionTransformer
from tpuwsi.preprocess.recipes import make_recipe
from tpuwsi.train import OptimConfig, make_optimizer
from tpuwsi.train.state import create_train_state
from tpuwsi.train.supervised import make_multi_step, make_train_step


def _tiny_state_and_step():
    model = VisionTransformer(
        ViTConfig(img_size=32, patch_size=16, embed_dim=32, depth=2,
                  num_heads=2, num_classes=2, dtype=jnp.float32,
                  use_pallas_attention=False)
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3), jnp.float32)
    )
    tx, _ = make_optimizer(
        OptimConfig(opt="adamw", lr=1e-3, warmup_epochs=0), params,
        global_batch_size=4,
    )
    state = create_train_state(params, tx)
    aug = make_recipe("flip", train=True, tile_size=32)
    step = make_train_step(model.apply, tx, augment_fn=aug, ema_decay=0.9)
    return state, step


def test_multi_step_matches_single_steps():
    state, step = _tiny_state_and_step()
    rng = jax.random.PRNGKey(7)
    rngnp = np.random.default_rng(1)
    batches = [
        {
            "images": rngnp.integers(0, 255, (4, 32, 32, 3), dtype=np.uint8),
            "labels": rngnp.integers(0, 2, (4,), dtype=np.int64),
        }
        for _ in range(4)
    ]

    s1 = state
    jstep = jax.jit(step)
    for b in batches:
        s1, m1 = jstep(s1, {k: jnp.asarray(v) for k, v in b.items()}, rng)

    multi = jax.jit(make_multi_step(step))
    stacked = {
        k: jnp.asarray(np.stack([b[k] for b in batches]))
        for k in ("images", "labels")
    }
    s4, m4 = multi(state, stacked, rng)

    assert int(s1.step) == int(s4.step) == 4
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.params), jax.tree_util.tree_leaves(s4.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    # EMA tree advanced identically too
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.ema_params),
        jax.tree_util.tree_leaves(s4.ema_params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    # last-step metrics correspond to the 4th step
    np.testing.assert_allclose(float(m1["loss"]), float(m4["loss"]), atol=1e-6)


def test_multi_step_dp_mesh_matches_single_device():
    """The stacked (steps, batch, ...) super-batch sharded on axis 1 over a
    dp=4 mesh must produce the same state as the sequential single-device
    loop (GSPMD gradient all-reduce under lax.scan)."""
    from tpuwsi.core.mesh import MeshConfig, create_mesh, shard_batch
    from tpuwsi.train.supervised import compile_step

    state, step = _tiny_state_and_step()
    rng = jax.random.PRNGKey(3)
    rngnp = np.random.default_rng(2)
    batches = [
        {
            "images": rngnp.integers(0, 255, (8, 32, 32, 3), dtype=np.uint8),
            "labels": rngnp.integers(0, 2, (8,), dtype=np.int64),
        }
        for _ in range(3)
    ]

    s_ref = state
    jstep = jax.jit(step)
    for b in batches:
        s_ref, _ = jstep(s_ref, {k: jnp.asarray(v) for k, v in b.items()}, rng)

    mesh = create_mesh(MeshConfig(data=4), devices=jax.devices()[:4])
    jit_multi = compile_step(
        make_multi_step(step), mesh, state, donate=False
    )
    stacked = {
        k: np.stack([b[k] for b in batches]) for k in ("images", "labels")
    }
    with mesh:
        sb = shard_batch(mesh, stacked, batch_axis=1)
        s_mesh, _ = jit_multi(state, sb, rng)

    assert int(s_mesh.step) == int(s_ref.step) == 3
    for a, b in zip(
        jax.tree_util.tree_leaves(s_ref.params),
        jax.tree_util.tree_leaves(s_mesh.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=2e-5
        )


def test_interval_hit_matches_per_step_semantics():
    from tpuwsi.cli.train import _chunked_enumerate, _interval_hit

    # spd=1 degenerates to i % n == 0
    for n in (1, 2, 5):
        for i in range(12):
            assert _interval_hit(i, i, n) == (i % n == 0)
    # chunked: fires iff any k in [i, j] is a multiple
    for n in (2, 3, 5):
        for spd in (2, 3, 4):
            chunks = list(_chunked_enumerate(range(13), spd))
            fired = [
                (i, i + len(c) - 1)
                for i, c in chunks
                if _interval_hit(i, i + len(c) - 1, n)
            ]
            expect = [
                (i, i + len(c) - 1)
                for i, c in chunks
                if any(k % n == 0 for k in range(i, i + len(c)))
            ]
            assert fired == expect


def test_prefetcher_propagates_producer_error():
    from tpuwsi.io.wsi import Prefetcher

    def gen():
        yield 1
        raise RuntimeError("slide read failed")

    pf = Prefetcher(gen(), depth=2)
    out = [next(pf)]
    with pytest.raises(RuntimeError, match="slide read failed"):
        next(pf)
    assert out == [1]


def test_prefetcher_close_unblocks_producer():
    import threading
    import time as _time

    from tpuwsi.io.wsi import Prefetcher

    produced = []

    def gen():
        for i in range(1000):
            produced.append(i)
            yield i

    pf = Prefetcher(gen(), depth=2)
    next(pf)
    pf.close()
    # producer thread must exit promptly, not stay parked on a full queue
    pf._thread.join(timeout=3.0)
    assert not pf._thread.is_alive()
    assert len(produced) < 1000


def test_chunked_enumerate_closes_source_on_break():
    from tpuwsi.cli.train import _chunked_enumerate
    from tpuwsi.io.wsi import Prefetcher

    pf = Prefetcher(iter(range(100)), depth=2)
    for i, chunk in _chunked_enumerate(pf, 4):
        if i >= 8:
            break
    # the for-loop break closes the generator, whose finally closes pf
    pf._thread.join(timeout=3.0)
    assert not pf._thread.is_alive()


from tests.test_cli import survival_cli_cohort  # noqa: F401  (fixture)


def test_cli_survival_steps_per_dispatch(survival_cli_cohort, tmp_path):
    """The survival loop stacks all four batch keys for the scanned driver."""
    from tpuwsi.cli.train import main

    out = str(tmp_path / "runs")
    state = main([
        "--dataset", "ABCTB_TIF",
        "--data-root", survival_cli_cohort,
        "--model", "vit_tiny_patch16_224",
        "--tile-size", "32",
        "-b", "4",
        "--epochs", "1",
        "--max-steps-per-epoch", "4",
        "--warmup-epochs", "0",
        "--transform_type", "flip",
        "--output", out,
        "--eval_rate", "100",
        "-tf", "1",
        "-tar", "Survival_Time",
        "--steps-per-dispatch", "2",
    ])
    assert int(state.step) >= 4


def test_cli_steps_per_dispatch(tmp_path):
    from tpuwsi.cli.train import main

    rng = np.random.default_rng(0)
    for cls, base in (("neg", 40), ("pos", 200)):
        os.makedirs(tmp_path / "train" / cls)
        for i in range(8):
            arr = np.clip(
                rng.normal(base, 20, (32, 32, 3)), 0, 255
            ).astype(np.uint8)
            Image.fromarray(arr).save(tmp_path / "train" / cls / f"{i}.png")

    out = str(tmp_path / "runs")
    state = main([
        "--data-dir", str(tmp_path / "train"),
        "--model", "vit_tiny_patch16_224",
        "--img-size", "32",
        "-b", "4",
        "--epochs", "1",
        "--warmup-epochs", "0",
        "--transform_type", "flip",
        "--output", out,
        "--eval_rate", "100",
        "--val-split", "0",
        "--steps-per-dispatch", "2",
    ])
    # 16 images / batch 4 = 4 steps (2 scanned dispatches)
    assert int(state.step) == 4


def test_cli_max_steps_exact_with_dispatch_chunks(tmp_path):
    """--max-steps-per-epoch must be EXACT under --steps-per-dispatch (an
    unclipped chunk used to overshoot by up to spd-1 steps)."""
    from tpuwsi.cli.train import main

    rng = np.random.default_rng(1)
    for cls, base in (("neg", 40), ("pos", 200)):
        os.makedirs(tmp_path / "train" / cls)
        for i in range(12):
            arr = np.clip(
                rng.normal(base, 20, (32, 32, 3)), 0, 255
            ).astype(np.uint8)
            Image.fromarray(arr).save(tmp_path / "train" / cls / f"{i}.png")

    state = main([
        "--data-dir", str(tmp_path / "train"),
        "--model", "vit_tiny_patch16_224",
        "--img-size", "32", "-b", "4", "--epochs", "1",
        "--warmup-epochs", "0", "--transform_type", "flip",
        "--output", str(tmp_path / "runs"),
        "--eval_rate", "100", "--val-split", "0",
        "--steps-per-dispatch", "4",
        "--max-steps-per-epoch", "3",   # mid-chunk bound
    ])
    assert int(state.step) == 3


def test_multi_step_threads_batch_stats():
    """BN models (resnet50) under --steps-per-dispatch: the batch_stats
    collection rides the scan carry. One scanned step must match one direct
    dispatch (loss exact, stats bit-equal, params to jit-boundary roundoff);
    multi-step equality is NOT asserted beyond that — BN's rsqrt amplifies
    the ~2e-6 fusion-boundary difference chaotically across steps."""
    from tpuwsi.models.resnet_trunc import resnet50
    from tpuwsi.train import OptimConfig, create_train_state, make_optimizer
    from tpuwsi.train.supervised import make_multi_step, make_train_step

    model = resnet50(num_classes=2, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 16, 16, 3), jnp.float32))
    params = {"params": variables["params"]}
    tx, _ = make_optimizer(OptimConfig(opt="sgd", lr=0.1, weight_decay=0.0),
                           params, global_batch_size=4)
    state = create_train_state(params, tx, ema=True,
                               batch_stats=variables["batch_stats"])
    step = make_train_step(model.apply, tx, augment_fn=None,
                           compute_auc=False, ema_decay=0.9,
                           use_batch_stats=True)
    rngnp = np.random.default_rng(3)
    b = {
        "images": jnp.asarray(rngnp.random((4, 16, 16, 3)), jnp.float32),
        "labels": jnp.asarray(rngnp.integers(0, 2, (4,))),
    }
    rng = jax.random.PRNGKey(5)

    s1, m1 = jax.jit(step)(state, b, rng)
    multi = jax.jit(make_multi_step(step))
    s2, m2 = multi(state, {k: v[None] for k, v in b.items()}, rng)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), atol=1e-6)
    for tree, tol in (("params", 1e-5), ("batch_stats", 0.0),
                      ("ema_batch_stats", 1e-7)):
        for a, c in zip(jax.tree_util.tree_leaves(getattr(s1, tree)),
                        jax.tree_util.tree_leaves(getattr(s2, tree))):
            np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                       atol=tol, err_msg=tree)
    # a 3-step scan still runs and keeps advancing the stats
    stacked = {
        "images": jnp.asarray(rngnp.random((3, 4, 16, 16, 3)), jnp.float32),
        "labels": jnp.asarray(rngnp.integers(0, 2, (3, 4))),
    }
    s3, _ = multi(state, stacked, rng)
    assert int(s3.step) == 3
    init_leaves = jax.tree_util.tree_leaves(variables["batch_stats"])
    assert any(
        not np.allclose(np.asarray(a), np.asarray(c))
        for a, c in zip(jax.tree_util.tree_leaves(s3.batch_stats), init_leaves)
    )
