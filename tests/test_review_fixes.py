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
