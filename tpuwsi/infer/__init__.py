from tpuwsi.infer.slide_walker import InferChunk, SlideWalker
from tpuwsi.infer.aggregate import SlideAggregator, SlideResult, roc_auc
from tpuwsi.infer.pipeline import eval_stream, pipelined_fetch
from tpuwsi.infer.survival_walker import (
    SurvivalAggregator,
    SurvivalSlideResult,
    SurvivalSlideWalker,
    infer_survival_slides,
)

__all__ = [
    "InferChunk",
    "SlideWalker",
    "SlideAggregator",
    "SlideResult",
    "roc_auc",
    "eval_stream",
    "pipelined_fetch",
    "SurvivalAggregator",
    "SurvivalSlideResult",
    "SurvivalSlideWalker",
    "infer_survival_slides",
]
