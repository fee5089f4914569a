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


def eval_stream(
    chunks: Iterable[Any],
    images_of,
    single_call,
    multi_call=None,
    k: int = 1,
    depth: int = 2,
) -> Iterator[Tuple[Any, Any]]:
    """Per-chunk ``(chunk, host_outputs)`` stream for the serving loops.

    ``k <= 1``: one dispatch per chunk through ``single_call(images)``,
    fetch-pipelined — the round-3 behavior.

    ``k > 1``: stacks k chunks' images and dispatches ONE scanned eval
    (``multi_call(stacked)``, built with
    ``train.supervised.make_multi_eval_step``) per stack — the serving-side
    analogue of the training ``--steps-per-dispatch`` driver. The device
    runs k forwards autonomously per dispatch, amortizing the fixed
    dispatch+fetch overhead (~21 ms/call measured on the tunneled chip,
    sub-ms but nonzero on TPU VMs) k-fold. The final partial stack is
    padded by repeating its last chunk (static shapes: no extra compile
    through the remote-compile tunnel) and the padded outputs dropped.
    Chunks whose input shapes differ from the stream's first (a ragged
    drop_last=False tail batch) fall back to ``single_call`` IN PLACE:
    any pending stack flushes first (padded), then the ragged chunk's
    output is yielded at its original stream position — stream order is
    ALWAYS preserved, so order-sensitive consumers (SlideAggregator flushes
    per-slide state on is_last_batch) are safe even with a non-padding
    walker (advisor round-4; previously ragged chunks were deferred to the
    END of the stream). The slide walkers pad to static shapes so in
    practice only folder-mode tail batches hit the fallback.
    ``images_of`` may return a single array OR any pytree of arrays (e.g.
    a MIL {features, mask} bag): stacking is per-leaf.
    Yields per-chunk host outputs either way — call sites are identical.
    """
    if k <= 1 or multi_call is None:

        def _single():
            for c in chunks:
                yield c, single_call(images_of(c))

        yield from pipelined_fetch(_single(), depth=depth)
        return

    def _leaf_shapes(tree):
        return tuple(x.shape for x in jax.tree_util.tree_leaves(tree))

    def _stacks():
        # yields ((metas, is_single), device_out): a k-stack scan dispatch
        # (is_single=False, outputs unstacked downstream) or an in-place
        # ragged-chunk single dispatch (is_single=True)
        buf: list = []
        shape = None

        def fire():
            metas = [c for c, _ in buf]
            arrs = [a for _, a in buf]
            arrs += [arrs[-1]] * (k - len(arrs))
            stacked = jax.tree_util.tree_map(
                lambda *xs: np.stack(xs), *arrs)
            return (metas, False), multi_call(stacked)

        for c in chunks:
            arr = jax.tree_util.tree_map(np.asarray, images_of(c))
            if shape is None:
                shape = _leaf_shapes(arr)
            if _leaf_shapes(arr) != shape:
                if buf:  # flush pending stack first — order preserved
                    yield fire()
                    buf.clear()
                yield ([c], True), single_call(arr)
                continue
            buf.append((c, arr))
            if len(buf) == k:
                yield fire()
                buf.clear()
        if buf:
            yield fire()

    for (metas, is_single), outs in pipelined_fetch(_stacks(), depth=depth):
        if is_single:
            yield metas[0], outs
        else:
            for i, meta in enumerate(metas):
                yield meta, jax.tree_util.tree_map(lambda x, i=i: x[i], outs)


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
