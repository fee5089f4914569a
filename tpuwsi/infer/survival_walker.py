"""Slide-walking survival inference.

Parity: ``Infer_Dataset_Survival`` (datasets.py:3243-3461) — walks every
slide of the selected folds in fixed chunks and emits, per chunk, the
survival targets alongside the tiles (returns at :3449-3461: 'Binary
Target', 'Time Target', 'Censored', 'Patch Loc', 'Is Last Batch', ...).
TPU-native: chunks are padded + masked like the plain SlideWalker so every
device step has a static shape, and per-slide risk aggregation + C-index /
binary AUC run host-side once per slide.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterator, List, Optional

import numpy as np

from tpuwsi.infer.aggregate import roc_auc
from tpuwsi.infer.slide_walker import SlideWalker
from tpuwsi.utils.labels import get_label


class SurvivalSlideWalker(SlideWalker):
    """SlideWalker over a survival SlideTable: chunks carry Binary Target /
    Time Target / Censored (datasets.py:3449-3461)."""

    def walk(self):
        t = self.table
        if t.target_binary is None or t.target_cont is None:
            raise ValueError("SurvivalSlideWalker needs a survival SlideTable")
        binary = [get_label(b)[0] for b in t.target_binary]
        for chunk in super().walk():
            i = chunk.slide_index
            chunk.binary_target = binary[i]
            chunk.time_target = float(t.target_cont[i])
            chunk.censored = bool(t.censored[i])
            yield chunk


@dataclasses.dataclass
class SurvivalSlideResult:
    slide_name: str
    patient_barcode: str
    binary_target: int
    time_target: float
    censored: bool
    tile_risks: np.ndarray  # (n_tiles,)
    tile_locations: List

    @property
    def slide_risk(self) -> float:
        return float(self.tile_risks.mean()) if len(self.tile_risks) else 0.0


class SurvivalAggregator:
    """Accumulates masked per-tile risk chunk by chunk; slide-level metrics.

    C-index over (risk, time, event=not censored) follows the reference's
    eval convention (train loop metric, and the risk direction of
    cox_partial_likelihood: higher risk → shorter expected survival).
    """

    def __init__(self):
        self._risks: List[np.ndarray] = []
        self._locs: List = []
        self.results: List[SurvivalSlideResult] = []

    def add_chunk(self, chunk, risks: np.ndarray):
        """risks: (tiles_per_iter,) model risk scores (padded)."""
        m = chunk.mask
        self._risks.append(np.asarray(risks).reshape(-1)[: len(m)][m])
        self._locs.extend(chunk.locations)
        if chunk.is_last_batch:
            self.results.append(
                SurvivalSlideResult(
                    slide_name=chunk.slide_name,
                    patient_barcode=chunk.patient_barcode,
                    binary_target=int(chunk.binary_target),
                    time_target=float(chunk.time_target),
                    censored=bool(chunk.censored),
                    tile_risks=np.concatenate(self._risks),
                    tile_locations=list(self._locs),
                )
            )
            self._risks, self._locs = [], []

    def slide_c_index(self) -> float:
        """Concordance over slides: P(risk_i > risk_j | t_i < t_j, event_i)."""
        risks = np.asarray([r.slide_risk for r in self.results])
        times = np.asarray([r.time_target for r in self.results])
        events = np.asarray([not r.censored for r in self.results], dtype=bool)
        num = den = 0.0
        n = len(risks)
        for i in range(n):
            if not events[i]:
                continue
            for j in range(n):
                if times[i] < times[j]:
                    den += 1.0
                    if risks[i] > risks[j]:
                        num += 1.0
                    elif risks[i] == risks[j]:
                        num += 0.5
        return float(num / den) if den else 0.5

    def slide_binary_auc(self) -> float:
        """AUC of slide risk against the binary survival target (unknown
        targets, -1, excluded)."""
        scores, labels = [], []
        for r in self.results:
            if r.binary_target in (0, 1):
                scores.append(r.slide_risk)
                # Binary target 'Positive' == survived 5 yr → LOW risk; align
                # AUC so that higher risk predicts the negative class.
                labels.append(1 - r.binary_target)
        return roc_auc(scores, labels)


def infer_survival_slides(
    walker: SurvivalSlideWalker,
    risk_fn,
    aggregator: Optional[SurvivalAggregator] = None,
    dispatch_ahead: int = 2,
    steps_per_dispatch: int = 1,
    multi_call=None,
) -> SurvivalAggregator:
    """Drive a full survival inference pass: ``risk_fn(images) -> (N,) risk``
    is the jitted model (Cox risk head or binary-logit margin).

    ``steps_per_dispatch > 1`` with ``multi_call(stacked) -> (K, N)`` runs
    the scanned serving driver (infer/pipeline.eval_stream)."""
    from tpuwsi.infer.pipeline import eval_stream

    agg = aggregator or SurvivalAggregator()
    for chunk, risks in eval_stream(
        walker.walk(), lambda c: c.images, risk_fn,
        multi_call=multi_call, k=steps_per_dispatch, depth=dispatch_ahead,
    ):
        agg.add_chunk(chunk, np.asarray(risks))
    return agg
