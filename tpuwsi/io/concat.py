"""Sequential dataset concatenation.

Parity: datasets.py:3464-3481 ``ConcatDataset`` — chains two (or more)
batch-iterable datasets; batches flow from each source in turn.
"""

from __future__ import annotations

from typing import Iterator


class ConcatDataset:
    def __init__(self, *datasets):
        if not datasets:
            raise ValueError("need at least one dataset")
        self.datasets = datasets

    def __len__(self):
        return sum(len(d) for d in self.datasets)

    def batches(self, *args, **kw) -> Iterator:
        for ds in self.datasets:
            yield from ds.batches(*args, **kw)
