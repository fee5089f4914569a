from tpuwsi.infer.slide_walker import InferChunk, SlideWalker
from tpuwsi.infer.aggregate import SlideAggregator, SlideResult, roc_auc

__all__ = [
    "InferChunk",
    "SlideWalker",
    "SlideAggregator",
    "SlideResult",
    "roc_auc",
]
