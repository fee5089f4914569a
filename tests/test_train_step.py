import jax
import jax.numpy as jnp
import numpy as np

from tpuwsi.core.mesh import MeshConfig, create_mesh, shard_batch
from tpuwsi.models import create_model
from tpuwsi.preprocess import make_recipe
from tpuwsi.ssl_dino import (
    DINOConfig,
    DINOModel,
    create_dino_state,
    make_dino_train_step,
)
from tpuwsi.models import DINOHead
from tpuwsi.models.vit import VisionTransformer, vit_tiny
from tpuwsi.preprocess.multicrop import MultiCropConfig, make_multicrop
from tpuwsi.train import (
    OptimConfig,
    compile_step,
    create_train_state,
    make_optimizer,
    make_train_step,
)


def _tiny_model(num_classes=2, img=32):
    cfg = vit_tiny(
        num_classes=num_classes,
        img_size=img,
        use_pallas_attention=False,
        dtype=jnp.float32,
    )
    import dataclasses

    cfg = dataclasses.replace(cfg, depth=2, embed_dim=64, num_heads=2)
    return VisionTransformer(cfg)


def test_supervised_step_runs_and_learns():
    model = _tiny_model()
    x = jnp.zeros((4, 32, 32, 3), jnp.uint8)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    ocfg = OptimConfig(opt="adamw", lr=1e-3, epochs=1, warmup_epochs=0,
                       steps_per_epoch=10)
    tx, _ = make_optimizer(ocfg, params, global_batch_size=4)
    state = create_train_state(params, tx, ema=True)
    aug = make_recipe("flip", train=True, tile_size=32)
    step = make_train_step(model.apply, tx, augment_fn=aug, ema_decay=0.9)

    # Learnable toy task: class = brightness.
    imgs = np.zeros((8, 32, 32, 3), np.uint8)
    imgs[4:] = 200
    labels = np.array([0] * 4 + [1] * 4)
    batch = {"images": jnp.asarray(imgs), "labels": jnp.asarray(labels)}
    rng = jax.random.PRNGKey(1)
    losses = []
    jit_step = jax.jit(step)
    for _ in range(30):
        state, metrics = jit_step(state, batch, rng)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    assert float(metrics["auc"]) == 1.0
    assert int(state.step) == 30


def test_supervised_step_dp_mesh():
    # Full DP semantics on the 8-virtual-device CPU mesh (SURVEY §4).
    mesh = create_mesh(MeshConfig(data=8, model=1))
    model = _tiny_model()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    ocfg = OptimConfig(opt="sgd", lr=0.1)
    tx, _ = make_optimizer(ocfg, params, global_batch_size=16)
    state = create_train_state(params, tx)
    aug = make_recipe("flip", train=True, tile_size=32)
    step = make_train_step(model.apply, tx, augment_fn=aug)

    with mesh:
        jit_step = compile_step(step, mesh, state, donate=False)
        imgs = np.random.randint(0, 255, (16, 32, 32, 3), dtype=np.uint8)
        labels = np.random.randint(0, 2, (16,))
        batch = shard_batch(mesh, {"images": imgs, "labels": labels})
        rng = jax.random.PRNGKey(0)
        new_state, metrics = jit_step(state, batch, rng)
    assert np.isfinite(float(metrics["loss"]))
    # grads were all-reduced: params stay replicated & identical
    leaf = jax.tree_util.tree_leaves(new_state.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_dp_grad_matches_single_device():
    # The sharded step must produce the same update as an unsharded one.
    model = _tiny_model()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    ocfg = OptimConfig(opt="sgd", lr=0.1, weight_decay=0.0)
    tx, _ = make_optimizer(ocfg, params, global_batch_size=8)
    step = make_train_step(model.apply, tx, augment_fn=None)

    imgs = np.random.RandomState(0).rand(8, 32, 32, 3).astype(np.float32)
    labels = np.arange(8) % 2
    batch = {"images": jnp.asarray(imgs), "labels": jnp.asarray(labels)}
    rng = jax.random.PRNGKey(3)

    state1 = create_train_state(params, tx)
    s1, m1 = jax.jit(step)(state1, batch, rng)

    mesh = create_mesh(MeshConfig(data=8, model=1))
    state2 = create_train_state(params, tx)
    with mesh:
        jit_step = compile_step(step, mesh, state2, donate=False)
        sharded = shard_batch(mesh, {"images": imgs, "labels": np.asarray(labels)})
        s2, m2 = jit_step(state2, sharded, rng)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.params), jax.tree_util.tree_leaves(s2.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_dino_step_runs_and_improves():
    backbone_cfg = vit_tiny(
        num_classes=0, img_size=32, use_pallas_attention=False, dtype=jnp.float32
    )
    import dataclasses

    backbone_cfg = dataclasses.replace(backbone_cfg, depth=2, embed_dim=64, num_heads=2)
    model = DINOModel(
        backbone=VisionTransformer(backbone_cfg),
        head=DINOHead(out_dim=256, hidden_dim=64, bottleneck_dim=32),
    )
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    dcfg = DINOConfig(out_dim=256, n_local=2, total_steps=20,
                      warmup_teacher_temp=0.02, warmup_teacher_temp_steps=10)
    ocfg = OptimConfig(opt="adamw", lr=1e-3, weight_decay=0.0)
    tx, _ = make_optimizer(ocfg, params, global_batch_size=4)
    state = create_dino_state(params, tx, dcfg)

    mc = make_multicrop(MultiCropConfig(global_size=32, local_size=16, n_local=2))
    step = jax.jit(
        make_dino_train_step(model.apply, tx, dcfg, multicrop_fn=mc)
    )
    imgs = np.random.randint(0, 255, (4, 48, 48, 3), dtype=np.uint8)
    batch = {"images": jnp.asarray(imgs)}
    rng = jax.random.PRNGKey(7)
    losses = []
    for _ in range(5):
        state, metrics = step(state, batch, rng)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert int(state.step) == 5
    # teacher must differ from student (EMA) but stay close at high momentum
    s0 = jax.tree_util.tree_leaves(state.student_params)[0]
    t0 = jax.tree_util.tree_leaves(state.teacher_params)[0]
    assert not np.allclose(np.asarray(s0), np.asarray(t0))
    # center was updated away from zero
    assert float(jnp.abs(state.center).max()) > 0


def test_scheduled_step_transparent_on_cpu_and_caches_by_signature():
    """core.compile.scheduled_step: on non-TPU backends it must be a
    transparent pass-through; repeated calls with different shapes must not
    break (per-signature cache)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpuwsi.core.compile import scheduled_step

    step = scheduled_step(jax.jit(lambda s, x: (s + 1, x.sum())))
    s, r1 = step(jnp.asarray(0), jnp.ones((4, 3)))
    s, r2 = step(s, jnp.ones((8, 3)))  # different shape — must not raise
    assert int(s) == 2
    assert float(r1) == 12.0 and float(r2) == 24.0
    assert np.isfinite(float(r2))


def test_layer_decay_scales_updates():
    """timm --layer-decay: a constant gradient must produce updates whose
    magnitude decays by exactly layer_decay per block going toward the
    input, with the head unscaled — checked for both the unrolled and the
    scanned (stacked blocks_scan) param trees."""
    import dataclasses as _dc

    from tpuwsi.models.vit import VisionTransformer, vit_tiny
    from tpuwsi.train.optim import scale_updates_by_layer_decay

    for scan in (False, True):
        cfg = _dc.replace(
            vit_tiny(num_classes=2, img_size=32, use_pallas_attention=False,
                     dtype=jnp.float32),
            depth=2, embed_dim=64, num_heads=2, scan_blocks=scan,
        )
        model = VisionTransformer(cfg)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
        tx = scale_updates_by_layer_decay(params, 0.5)
        st = tx.init(params)
        ones = jax.tree_util.tree_map(jnp.ones_like, params)
        scaled, _ = tx.update(ones, st)

        def leaf(tree, *path):
            node = tree["params"]
            for k in path:
                node = node[k]
            return jax.tree_util.tree_leaves(node)[0]

        # depth=2 → L+1 = 3: head scale 1, block1 0.5, block0 0.25,
        # patch_embed 0.125
        head = np.asarray(leaf(scaled, "head"))
        assert np.allclose(head, 1.0)
        pe = np.asarray(leaf(scaled, "patch_embed"))
        assert np.allclose(pe, 0.5 ** 3)
        if scan:
            stacked = np.asarray(leaf(scaled, "blocks_scan"))
            # leading axis = depth: block0 then block1
            assert np.allclose(stacked[0], 0.25) and np.allclose(
                stacked[1], 0.5
            )
        else:
            assert np.allclose(np.asarray(leaf(scaled, "blocks_0")), 0.25)
            assert np.allclose(np.asarray(leaf(scaled, "blocks_1")), 0.5)


def test_layer_decay_through_make_optimizer():
    model = _tiny_model()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    ocfg = OptimConfig(opt="sgd", lr=0.1, weight_decay=0.0, momentum=0.0,
                       layer_decay=0.5, sched="constant", warmup_epochs=0)
    tx, _ = make_optimizer(ocfg, params, global_batch_size=8)
    st = tx.init(params)
    ones = jax.tree_util.tree_map(jnp.ones_like, params)
    upd, _ = tx.update(ones, st, params)
    head = jax.tree_util.tree_leaves(upd["params"]["head"])[0]
    blk0 = jax.tree_util.tree_leaves(upd["params"]["blocks_0"])[0]
    # sgd: update = -lr·g, layer scale multiplies on top
    assert np.allclose(np.asarray(head), -0.1)
    assert np.allclose(np.asarray(blk0), -0.1 * 0.25)


def test_opt_eps_betas_and_step_sched_flags():
    from tpuwsi.cli.args import parse_args

    a = parse_args(["--opt-eps", "1e-6", "--opt-betas", "0.9", "0.95",
                    "--sched", "step", "--decay-epochs", "2.5",
                    "--decay-rate", "0.5", "--layer-decay", "0.75"])
    assert a.opt_eps == 1e-6 and a.opt_betas == [0.9, 0.95]
    assert a.decay_epochs == 2.5 and a.decay_rate == 0.5
    assert a.layer_decay == 0.75
    # the step schedule uses decay_epochs/decay_rate (timm --decay-epochs)
    from tpuwsi.train.optim import make_schedule

    ocfg = OptimConfig(opt="sgd", sched="step", decay_epochs=2.5,
                       decay_rate=0.5, steps_per_epoch=10, warmup_epochs=0,
                       epochs=10)
    sched = make_schedule(ocfg, peak_lr=1.0)
    assert float(sched(0)) == 1.0
    assert float(sched(24)) == 1.0  # still before the first 25-step boundary
    assert float(sched(25)) == 0.5
    assert float(sched(50)) == 0.25


def test_soft_loss_fn_bce_under_mixup():
    """--bce-loss routes MIXED soft targets through sigmoid BCE with
    --bce-target-thresh re-binarization (timm BinaryCrossEntropy)."""
    from tpuwsi.train.losses import binary_cross_entropy_soft

    logits = jnp.asarray([[4.0, -4.0], [-4.0, 4.0]])
    soft = jnp.asarray([[0.7, 0.3], [0.1, 0.9]])
    # thresh 0.5 → hard {1,0},{0,1}; must equal BCE on those hard targets
    import optax

    hard = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])
    want = float(optax.sigmoid_binary_cross_entropy(logits, hard).mean())
    got = float(binary_cross_entropy_soft(logits, soft, target_thresh=0.5))
    np.testing.assert_allclose(got, want, rtol=1e-6)

    # and make_train_step accepts/uses soft_loss_fn with a mix_fn
    from tpuwsi.preprocess.batch_aug import make_mixup_cutmix

    model = _tiny_model()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    ocfg = OptimConfig(opt="sgd", lr=0.1)
    tx, _ = make_optimizer(ocfg, params, global_batch_size=4)
    state = create_train_state(params, tx)
    aug = make_recipe("flip", train=True, tile_size=32)
    mix = make_mixup_cutmix(2, mixup_alpha=0.8, smoothing=0.0)
    step = make_train_step(
        model.apply, tx, augment_fn=aug, mix_fn=mix,
        soft_loss_fn=lambda l, y: binary_cross_entropy_soft(l, y, 0.3),
    )
    imgs = jnp.zeros((4, 32, 32, 3), jnp.uint8)
    labels = jnp.asarray([0, 1, 0, 1])
    state, metrics = jax.jit(step)(
        state, {"images": imgs, "labels": labels}, jax.random.PRNGKey(1)
    )
    assert np.isfinite(float(metrics["loss"]))
