"""On-device metrics.

The reference computes sklearn ``roc_auc_score`` on CPU every training step
(train.py:1054) — a device→host sync per iteration (SURVEY §3.1 hot loop).
Here AUC is computed on device via the rank statistic (Mann-Whitney U) with
average-rank tie handling, jit-able and maskable, so the step never syncs.
Slide-level aggregation parity: slide score = mean of tile softmax
(train.py:1288-1289), slide target = first tile's target.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _average_ranks(scores):
    """1-based average ranks with tie correction (matches scipy rankdata)."""
    n = scores.shape[0]
    order = jnp.argsort(scores)
    sorted_scores = scores[order]
    # rank positions 1..n in sorted order
    pos = jnp.arange(1, n + 1, dtype=jnp.float32)
    # For ties: average the positions of equal values. Compute for each sorted
    # element the first and last index of its tie group via searchsorted.
    first = jnp.searchsorted(sorted_scores, sorted_scores, side="left")
    last = jnp.searchsorted(sorted_scores, sorted_scores, side="right") - 1
    avg = (first + last).astype(jnp.float32) / 2.0 + 1.0
    ranks_sorted = avg
    inv = jnp.zeros(n, dtype=jnp.int32).at[order].set(jnp.arange(n))
    del pos
    return ranks_sorted[inv]


def auc_score(scores, labels, mask=None):
    """Binary ROC-AUC of scores for class 1. Returns NaN-free 0.5 when only
    one class is present (the reference wraps sklearn in try/except).

    scores: (N,) float; labels: (N,) int {0,1}; mask: (N,) bool or None.
    """
    scores = scores.astype(jnp.float32)
    labels = labels.astype(jnp.int32)
    if mask is None:
        mask = jnp.ones_like(labels, dtype=bool)
    # Push masked entries to -inf so their ranks are lowest, then subtract
    # their contribution exactly by not counting them as pos/neg.
    neg_fill = jnp.float32(-jnp.inf)
    s = jnp.where(mask, scores, neg_fill)
    ranks = _average_ranks(s)
    is_pos = (labels == 1) & mask
    is_neg = (labels == 0) & mask
    n_pos = is_pos.sum()
    n_neg = is_neg.sum()
    # Ranks of masked entries are below all real ones only if all real scores
    # > -inf; correct the positive rank-sum by the number of masked entries
    # ranked beneath (they shift every real rank up uniformly).
    n_masked = (~mask).sum()
    rank_sum_pos = jnp.where(is_pos, ranks, 0.0).sum() - n_pos * n_masked
    u = rank_sum_pos - n_pos * (n_pos + 1) / 2.0
    denom = (n_pos * n_neg).astype(jnp.float32)
    return jnp.where(denom > 0, u / jnp.maximum(denom, 1.0), 0.5)


def accuracy_topk(logits, labels, k=1, mask=None):
    if mask is None:
        mask = jnp.ones_like(labels, dtype=bool)
    topk = jnp.argsort(-logits, axis=-1)[:, :k]
    correct = jnp.any(topk == labels[:, None], axis=-1) & mask
    return correct.sum() / jnp.maximum(mask.sum(), 1)


def slide_scores_from_tiles(tile_probs, slide_ids, num_slides, mask=None):
    """Mean tile softmax per slide (train.py:1288): segment-mean of the
    class-1 probability over tiles grouped by slide id."""
    if mask is None:
        mask = jnp.ones(tile_probs.shape[0], dtype=bool)
    w = mask.astype(jnp.float32)
    sums = jnp.zeros(num_slides).at[slide_ids].add(tile_probs * w)
    counts = jnp.zeros(num_slides).at[slide_ids].add(w)
    return sums / jnp.maximum(counts, 1.0), counts > 0


class AverageMeter:
    """Host-side running average (timm AverageMeter parity for logging)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n=1):
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n

    @property
    def avg(self):
        return self.sum / max(self.count, 1)
