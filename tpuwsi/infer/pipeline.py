"""Dispatch-ahead pipelining for the serving loops.

The slide-eval / feature-extraction loops are dispatch-latency sensitive:
each chunk pays (a) the host tile reads, (b) the device dispatch, and (c)
the device→host fetch of probs/features. Fetching synchronously after every
dispatch serializes all three. Measured on the axon-tunneled v5e
(scripts/exp_infer.py): a b256 ViT-S eval forward is ~26.5 ms of marginal
compute but ~48 ms per serialized call — a fixed ~21 ms dispatch+fetch
overhead that pipelining hides almost entirely (production TPU VMs have
sub-ms dispatch, but the same structure is what overlaps the HOST walker
reads with device compute there).

``pipelined_fetch`` lags the fetch ``depth`` dispatches behind the producer:
JAX dispatch is async, so the device works on chunk i while the host decodes
chunk i+1 and fetches chunk i-depth. Bounded depth keeps at most ``depth``
chunk outputs resident on device (eval outputs are small — probs/features —
so depth 2-4 costs a few MB of HBM).

Reference counterpart: the torch pipeline gets the same overlap from
DataLoader worker prefetch + CUDA async streams (train.py:1185-1233);
this is the explicit jax-native equivalent.
"""

from __future__ import annotations

from collections import deque
from typing import Any, Iterable, Iterator, Tuple

import jax
import numpy as np


def _fetch(tree):
    """Force device→host for every array leaf (axon: block_until_ready does
    not surface completion — np.asarray does)."""
    return jax.tree_util.tree_map(
        lambda x: np.asarray(x) if hasattr(x, "device") or hasattr(x, "devices") else x,
        tree,
    )


def pipelined_fetch(
    dispatches: Iterable[Tuple[Any, Any]], depth: int = 2
) -> Iterator[Tuple[Any, Any]]:
    """Consume an iterator of ``(meta, device_output)`` pairs, yielding
    ``(meta, host_output)`` with the fetch lagging ``depth`` dispatches.

    The producer side runs eagerly: pulling the next pair dispatches the
    next eval step (async) before the previous outputs are fetched. Order
    is preserved; ``depth <= 0`` degrades to the synchronous loop.
    """
    if depth <= 0:
        for meta, out in dispatches:
            yield meta, _fetch(out)
        return
    q: deque = deque()
    for meta, out in dispatches:
        q.append((meta, out))
        if len(q) > depth:
            m, o = q.popleft()
            yield m, _fetch(o)
    while q:
        m, o = q.popleft()
        yield m, _fetch(o)
