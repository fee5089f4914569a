"""Regression tests for the round-3 session-3 review findings."""

import os

import jax.numpy as jnp
import numpy as np


def test_recovery_manager_keeps_latest_not_best(tmp_path):
    """rank_by_metric=False retains the most recent saves — under the best-K
    manager, metric-less recovery saves scored 0.0 and were GC'd first."""
    from tpuwsi.train.checkpoint import CheckpointManager

    state = {"w": jnp.arange(4.0)}
    mgr = CheckpointManager(
        str(tmp_path / "rec"), max_history=2, rank_by_metric=False
    )
    for step in (1, 2, 3):
        mgr.save(step, {"w": jnp.arange(4.0) + step}, {"recovery": 1.0})
    mgr.wait()
    assert mgr.latest_step() == 3
    restored = mgr.restore(target=state)
    np.testing.assert_allclose(np.asarray(restored["w"]), np.arange(4.0) + 3)


def test_ledger_concurrent_create_unique_ids(tmp_path):
    """The per-id claim marker makes simultaneous create() calls allocate
    DISTINCT experiment ids even when both read the same ledger state."""
    from tpuwsi.utils.ledger import ExperimentLedger

    a = ExperimentLedger(str(tmp_path))
    b = ExperimentLedger(str(tmp_path))
    # simulate the race: both instances snapshot state before either appends
    ea = a.create("ER", test_fold=1)
    eb = b.create("PR", test_fold=1)
    assert ea["Experiment"] != eb["Experiment"]
    assert ea["Location"] != eb["Location"]


def test_tracker_logs_array_metrics(tmp_path):
    from tpuwsi.utils.tracking import Tracker

    t = Tracker(str(tmp_path), use_wandb=False)
    t.log({"per_class": np.array([0.8, 0.7]), "scalar": 1.0}, step=1)
    t.finish()
    import json

    recs = [
        json.loads(l)
        for l in open(os.path.join(str(tmp_path), "metrics.jsonl"))
    ]
    assert recs[0]["per_class"] == [0.8, 0.7]


def test_loss_scale_fp16_loss_no_overflow():
    """scale_loss must not overflow when the loss arrives in fp16 (the
    default 2**16 scale exceeds fp16 max)."""
    from tpuwsi.core.precision import DynamicLossScale

    ls = DynamicLossScale()
    scaled = ls.scale_loss(jnp.float16(1.5))
    assert np.isfinite(float(scaled))
    assert float(scaled) == 1.5 * float(ls.scale)


def test_bn_ema_stats_tracked_and_used_in_ema_eval():
    """Round-4 review: timm ModelEmaV2 averages the FULL state_dict incl.
    BN running stats (reference train.py:616-622) — the EMA eval path must
    pair EMA weights with EMA stats, not the live ones."""
    import jax

    from tpuwsi.models.resnet_trunc import resnet50
    from tpuwsi.train import OptimConfig, create_train_state, make_optimizer
    from tpuwsi.train.supervised import make_eval_step, make_train_step

    model = resnet50(num_classes=2, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 3), jnp.float32))
    params = {"params": variables["params"]}
    tx, _ = make_optimizer(OptimConfig(opt="sgd", lr=0.5, weight_decay=0.0),
                           params, global_batch_size=4)
    state = create_train_state(params, tx, ema=True,
                               batch_stats=variables["batch_stats"])
    assert state.ema_batch_stats is not None
    step = jax.jit(make_train_step(model.apply, tx, augment_fn=None,
                                   compute_auc=False, ema_decay=0.5,
                                   use_batch_stats=True))
    rng = np.random.RandomState(0)
    batch = {
        "images": jnp.asarray(rng.rand(4, 32, 32, 3), jnp.float32),
        "labels": jnp.asarray([0, 1, 0, 1]),
    }
    for _ in range(2):
        state, _ = step(state, batch, jax.random.PRNGKey(1))

    live = jnp.concatenate([x.ravel() for x in
                            jax.tree_util.tree_leaves(state.batch_stats)])
    ema = jnp.concatenate([x.ravel() for x in
                           jax.tree_util.tree_leaves(state.ema_batch_stats)])
    # EMA stats lag the live ones (decay 0.5 over 2 steps) but have moved
    assert not np.allclose(np.asarray(live), np.asarray(ema))
    assert np.abs(np.asarray(ema)).sum() > 0

    # EMA eval consumes the EMA stats: logits differ from a state whose
    # ema_batch_stats were zeroed-out live stats
    ev = jax.jit(make_eval_step(model.apply, use_ema=True))
    logits_ema, _ = ev(state, batch)
    tampered = state.replace(ema_batch_stats=jax.tree_util.tree_map(
        jnp.zeros_like, state.ema_batch_stats))
    logits_tampered, _ = ev(tampered, batch)
    assert not np.allclose(np.asarray(logits_ema),
                           np.asarray(logits_tampered))


def test_resnet50_honors_drop_rate_and_remat():
    """create_model('resnet50', drop_rate=..., grad_checkpointing=...) must
    not silently drop the knobs (round-4 review)."""
    import jax

    from tpuwsi.models.registry import create_model

    m = create_model("resnet50", num_classes=2, drop_rate=0.5,
                     grad_checkpointing=True, dtype=jnp.float32)
    assert m.drop_rate == 0.5 and m.remat_blocks
    variables = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    # train-mode forward draws a dropout rng; two keys → different logits
    # (inputs must VARY across the batch: train-mode BN zeroes a batch of
    # identical images — zero variance — and everything downstream)
    x = jnp.asarray(np.random.RandomState(3).rand(2, 32, 32, 3), jnp.float32)
    out1 = m.apply(variables, x, train=True,
                   mutable=["batch_stats"],
                   rngs={"dropout": jax.random.PRNGKey(1)})[0]
    out2 = m.apply(variables, x, train=True,
                   mutable=["batch_stats"],
                   rngs={"dropout": jax.random.PRNGKey(2)})[0]
    assert not np.allclose(np.asarray(out1), np.asarray(out2))


def test_explicit_drop_path_zero_wins_in_ssl_config():
    """--drop-path 0 must disable stochastic depth (round-4 review: `or`
    silently re-enabled the 0.1 default)."""
    from tpuwsi.cli.args import parse_args
    from tpuwsi.cli.train import ssl_backbone_config

    cfg = ssl_backbone_config(parse_args(["--drop-path", "0"]), False)
    assert cfg.drop_path_rate == 0.0
    cfg = ssl_backbone_config(parse_args([]), False)
    assert cfg.drop_path_rate == 0.1


def test_jax_num_processes_without_id_fails_loudly():
    import pytest

    from tpuwsi.core import distributed

    old = dict(os.environ)
    os.environ["JAX_COORDINATOR_ADDRESS"] = "127.0.0.1:1"
    os.environ["JAX_NUM_PROCESSES"] = "2"
    os.environ.pop("JAX_PROCESS_ID", None)
    distributed._initialized = False
    try:
        with pytest.raises(RuntimeError, match="JAX_PROCESS_ID"):
            distributed.initialize_multihost()
    finally:
        os.environ.clear()
        os.environ.update(old)
        distributed._initialized = True


def test_transcode_cli_rejects_basename_collision(tmp_path, capsys):
    from tpuwsi.cli.transcode import main

    os.makedirs(tmp_path / "a")
    os.makedirs(tmp_path / "b")
    for d in ("a", "b"):
        open(tmp_path / d / "s1.mrxs", "w").close()
    rc = main([str(tmp_path / "a" / "s1.mrxs"),
               str(tmp_path / "b" / "s1.mrxs"),
               "--output", str(tmp_path / "out")])
    assert rc == 2


def test_machine_cache_dir_keys_by_host_cpu(monkeypatch):
    """Persistent compile-cache dirs must differ across hosts: jax's cache
    key omits host CPU features, so cross-machine reuse loads XLA:CPU AOT
    executables built for another machine (SIGILL risk; round-4 find)."""
    from tpuwsi.core import compile as tc

    d1 = tc.machine_cache_dir("/tmp/c")
    assert d1.startswith("/tmp/c-") and len(d1) == len("/tmp/c-") + 8
    # deterministic on the same host
    assert tc.machine_cache_dir("/tmp/c") == d1

    # a different CPU flag set must produce a different directory
    real_machine = tc.platform.machine
    monkeypatch.setattr(tc.platform, "machine",
                        lambda: real_machine() + "-other")
    assert tc.machine_cache_dir("/tmp/c") != d1


# ---- round-4 session-2 review finds --------------------------------------


def test_plateau_scale_resume_roundtrip():
    """get_plateau_scale reads back what set_plateau_scale wrote, so the
    host PlateauController can re-sync on --resume (without it the first
    post-resume decay RAISES the LR: 1.0*factor > restored scale)."""
    import jax
    import jax.numpy as jnp

    from tpuwsi.train.optim import (
        OptimConfig,
        get_plateau_scale,
        make_optimizer,
        set_plateau_scale,
    )

    params = {"w": jnp.ones((3, 3)), "b": jnp.zeros((3,))}
    cfg = OptimConfig(opt="sgd", lr=1.0, sched="plateau", epochs=2,
                      warmup_epochs=0, steps_per_epoch=4)
    tx, _ = make_optimizer(cfg, params, global_batch_size=8)
    st = tx.init(params)
    assert get_plateau_scale(st) == 1.0
    st = set_plateau_scale(st, 0.01)
    assert abs(get_plateau_scale(st) - 0.01) < 1e-8  # f32 round-trip
    # non-plateau optimizer has no slot
    tx2, _ = make_optimizer(
        OptimConfig(opt="sgd", lr=1.0, sched="cosine", epochs=2,
                    warmup_epochs=0, steps_per_epoch=4),
        params, global_batch_size=8)
    assert get_plateau_scale(tx2.init(params)) is None


def test_lr_noise_window_honors_start_epoch_offset():
    """--start-epoch advances the noise epoch/range with the schedule
    (timm draws noise at the advanced epoch): _offset composes OUTSIDE
    _noise."""
    import numpy as np

    from tpuwsi.train.optim import OptimConfig, make_schedule

    kw = dict(opt="sgd", sched="constant", lr=1.0, epochs=10,
              warmup_epochs=0, steps_per_epoch=10,
              lr_noise=(0.2, 0.8), lr_noise_pct=0.3, lr_noise_std=0.5,
              schedule_offset_steps=30)  # start at epoch 3
    s = make_schedule(OptimConfig(**kw), 1.0)
    # count 0 == effective epoch 3: inside [2, 8) -> noise applied
    early = np.array([float(s(i)) for i in range(0, 10)])
    assert not np.allclose(early, 1.0)
    # count 60 == effective epoch 9: outside the range -> exact schedule
    late = np.array([float(s(i)) for i in range(60, 70)])
    np.testing.assert_allclose(late, 1.0)


def test_aug_splits_jitter_salt_same_crop_independent_jitter():
    """--aug-splits secondary splits: same crop/flip (shared primary
    transform) but INDEPENDENT ColorJitter per split (timm AugMixDataset
    applies the secondary stack per split)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpuwsi.preprocess.timm_aug import make_timm_train_aug

    rng = np.random.RandomState(0)
    # mid-range pixels: jitter stays affine (no [0,1] clipping), so the
    # shared-crop correlation check is exact rather than approximate
    imgs = rng.randint(60, 180, (2, 48, 48, 3)).astype(np.uint8)
    key = jax.random.PRNGKey(7)
    kw = dict(scale=(0.4, 1.0), ratio=(1.0, 1.0), hflip=0.5, vflip=0.0)
    b = np.asarray(make_timm_train_aug(32, color_jitter=0.2, jitter_salt=1,
                                       **kw)(key, jnp.asarray(imgs)))
    c = np.asarray(make_timm_train_aug(32, color_jitter=0.2, jitter_salt=2,
                                       **kw)(key, jnp.asarray(imgs)))
    # independent jitter: outputs differ
    assert np.abs(b - c).max() > 1e-3
    # shared crop/flip: per-image channel-mean maps are (approximately)
    # per-image affine images of each other — correlation stays ~1; a
    # different crop would decorrelate the spatial pattern
    for i in range(2):
        mb = b[i].mean(-1).ravel()
        mc = c[i].mean(-1).ravel()
        r = np.corrcoef(mb - mb.mean(), mc - mc.mean())[0, 1]
        assert r > 0.98, r
    d = np.asarray(make_timm_train_aug(32, color_jitter=0.2, jitter_salt=1,
                                       **kw)(jax.random.PRNGKey(8),
                                             jnp.asarray(imgs)))
    r_diff = np.corrcoef(b[0].mean(-1).ravel(), d[0].mean(-1).ravel())[0, 1]
    assert r_diff < 0.9, r_diff  # different key -> different crop


def test_aug_splits_requires_jsd(tmp_path):
    """--aug-splits without --jsd-loss exits cleanly instead of dying with
    an opaque N*B-vs-B shape error at trace time (split-BN is a documented
    non-goal)."""
    import numpy as np
    import pytest
    from PIL import Image

    from tpuwsi.cli.train import main

    rng = np.random.default_rng(0)
    for cls, base in (("neg", 40), ("pos", 200)):
        os.makedirs(tmp_path / "train" / cls)
        for i in range(4):
            arr = np.clip(rng.normal(base, 20, (32, 32, 3)),
                          0, 255).astype(np.uint8)
            Image.fromarray(arr).save(tmp_path / "train" / cls / f"{i}.png")

    with pytest.raises(SystemExit, match="jsd"):
        main([
            "--data-dir", str(tmp_path / "train"),
            "--model", "vit_tiny_patch16_224",
            "--img-size", "32", "-b", "8", "--epochs", "1",
            "--transform_type", "timm", "--output", str(tmp_path / "runs"),
            "--aug-splits", "3",
        ])


def test_sync_ckpt_env_falsy_values(tmp_path, monkeypatch):
    """TPUWSI_SYNC_CKPT=0/false re-enables async checkpointing (string
    truthiness bug: 'not \"0\"' was False)."""
    from tpuwsi.train.checkpoint import CheckpointManager

    monkeypatch.setenv("TPUWSI_SYNC_CKPT", "0")
    m = CheckpointManager(str(tmp_path / "a"))
    assert m._mgr._options.enable_async_checkpointing
    m.close()
    monkeypatch.setenv("TPUWSI_SYNC_CKPT", "1")
    m = CheckpointManager(str(tmp_path / "b"))
    assert not m._mgr._options.enable_async_checkpointing
    m.close()
