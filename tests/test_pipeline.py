"""Tests for the dispatch-ahead serving pipeline (infer/pipeline.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from tpuwsi.infer.pipeline import pipelined_fetch


def test_order_and_completeness():
    f = jax.jit(lambda x: x * 2)

    def dispatches():
        for i in range(7):
            yield i, f(jnp.full((3,), i))

    out = list(pipelined_fetch(dispatches(), depth=3))
    assert [m for m, _ in out] == list(range(7))
    for i, (_, arr) in enumerate(out):
        assert isinstance(arr, np.ndarray)
        np.testing.assert_array_equal(arr, np.full((3,), 2 * i))


def test_depth_zero_is_synchronous():
    out = list(
        pipelined_fetch(((i, jnp.ones((2,)) * i) for i in range(4)), depth=0)
    )
    assert len(out) == 4
    np.testing.assert_array_equal(out[3][1], np.full((2,), 3.0))


def test_pytree_outputs_and_lazy_producer():
    pulled = []

    def dispatches():
        for i in range(5):
            pulled.append(i)
            yield i, (jnp.asarray([i]), {"k": jnp.asarray([i + 10])})

    gen = pipelined_fetch(dispatches(), depth=2)
    meta, (a, d) = next(gen)
    # depth=2 lag: the producer has been pulled 3 ahead of the first yield
    assert meta == 0 and pulled == [0, 1, 2]
    np.testing.assert_array_equal(a, [0])
    np.testing.assert_array_equal(d["k"], [10])
    rest = list(gen)
    assert [m for m, _ in rest] == [1, 2, 3, 4]


def test_empty_iterator():
    assert list(pipelined_fetch(iter(()), depth=2)) == []
