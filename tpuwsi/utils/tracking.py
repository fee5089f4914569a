"""Experiment metric tracking.

Parity: the reference's wandb integration (train.py:447-450 init,
:1122-1127/:1142/:1334-1343 per-interval ROC/PR + AUC logging) and the email
export (utils.py:829-871 ``send_run_data_via_mail``). Here: a tracker facade
that uses wandb when installed AND enabled, and always writes an append-only
``metrics.jsonl`` (offline-first — this environment has no egress); ROC/PR
curve POINTS are logged as data so any frontend can render them. Email export
degrades to packaging the ledger for manual sending.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional, Sequence

import numpy as np


def roc_curve_points(scores: Sequence[float], labels: Sequence[int], n: int = 50):
    """(fpr, tpr) at n score thresholds — the data behind wandb.plot.roc_curve."""
    scores = np.asarray(scores, float)
    labels = np.asarray(labels)
    thresholds = np.quantile(scores, np.linspace(0, 1, n)) if len(scores) else []
    pts = []
    pos = max((labels == 1).sum(), 1)
    neg = max((labels == 0).sum(), 1)
    for t in thresholds:
        pred = scores >= t
        tpr = float(((labels == 1) & pred).sum() / pos)
        fpr = float(((labels == 0) & pred).sum() / neg)
        pts.append((fpr, tpr))
    return pts


def pr_curve_points(scores, labels, n: int = 50):
    scores = np.asarray(scores, float)
    labels = np.asarray(labels)
    thresholds = np.quantile(scores, np.linspace(0, 1, n)) if len(scores) else []
    pts = []
    for t in thresholds:
        pred = scores >= t
        tp = ((labels == 1) & pred).sum()
        precision = float(tp / max(pred.sum(), 1))
        recall = float(tp / max((labels == 1).sum(), 1))
        pts.append((recall, precision))
    return pts


class Tracker:
    def __init__(self, output_dir: str, project: str = "tpuwsi",
                 entity: Optional[str] = None, use_wandb: bool = False,
                 config: Optional[Dict] = None):
        os.makedirs(output_dir, exist_ok=True)
        self.path = os.path.join(output_dir, "metrics.jsonl")
        self._wandb = None
        if use_wandb:
            try:
                import wandb  # type: ignore

                self._wandb = wandb
                wandb.init(project=project, entity=entity, config=config or {})
            except Exception:
                self._wandb = None

    def log(self, metrics: Dict, step: Optional[int] = None):
        rec = {"_time": time.time()}
        if step is not None:
            rec["_step"] = int(step)
        rec.update({k: _to_jsonable(v) for k, v in metrics.items()})
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def log_roc_pr(self, scores, labels, prefix: str = "", step=None):
        self.log(
            {
                f"{prefix}roc_points": roc_curve_points(scores, labels),
                f"{prefix}pr_points": pr_curve_points(scores, labels),
            },
            step=step,
        )

    def finish(self):
        if self._wandb is not None:
            self._wandb.finish()


def _to_jsonable(v):
    if isinstance(v, (np.floating, np.integer)):
        return v.item()
    if hasattr(v, "item") and getattr(v, "size", 2) == 1:
        return v.item()
    if hasattr(v, "tolist"):
        # multi-element numpy/jax arrays (e.g. a per-class metric vector)
        # are not JSON-serializable and would kill the training loop at a
        # logging call — record them as lists
        return v.tolist()
    return v


def export_run_data_for_mail(runs_dir: str, out_path: Optional[str] = None) -> str:
    """utils.py:829-871 stand-in for a no-egress environment: package the
    ledger xlsx for manual emailing; returns the file path."""
    from tpuwsi.utils.ledger import ExperimentLedger

    ledger = ExperimentLedger(runs_dir)
    return ledger.export_xlsx(out_path)
