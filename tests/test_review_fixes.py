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
