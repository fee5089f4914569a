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


def test_eval_stream_scanned_matches_per_chunk():
    """k>1 scans k chunks per dispatch; outputs must equal the per-chunk
    path chunk-for-chunk, including a padded final partial stack."""
    from tpuwsi.infer.pipeline import eval_stream

    chunks = [{"id": i, "images": np.full((4, 2), i, np.float32)}
              for i in range(7)]  # 7 chunks, k=3 → 2 full stacks + pad-2

    def single(im):
        return jax.jit(lambda x: (x * 2, x.sum()))(jnp.asarray(im))

    multi = jax.jit(
        lambda st: jax.lax.scan(
            lambda c, x: (c, (x * 2, x.sum())), None, st)[1]
    )

    ref = list(eval_stream(iter(chunks), lambda c: c["images"], single,
                           k=1, depth=2))
    got = list(eval_stream(iter(chunks), lambda c: c["images"], single,
                           multi_call=lambda s: multi(jnp.asarray(s)),
                           k=3, depth=2))
    assert [m["id"] for m, _ in got] == [m["id"] for m, _ in ref] == list(range(7))
    for (_, (a, sa)), (_, (b, sb)) in zip(got, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
        np.testing.assert_allclose(np.asarray(sa), np.asarray(sb))


def test_eval_stream_ragged_tail_defers_to_single():
    """A drop_last=False ragged tail batch can't join a stack: it must be
    routed through single_call and yielded last, exactly once."""
    from tpuwsi.infer.pipeline import eval_stream

    chunks = [{"id": 0, "images": np.ones((4, 2), np.float32)},
              {"id": 1, "images": np.ones((4, 2), np.float32)},
              {"id": 2, "images": np.ones((3, 2), np.float32)}]  # ragged

    single_calls = []

    def single(im):
        single_calls.append(np.asarray(im).shape)
        return jnp.asarray(im) + 1

    multi = jax.jit(
        lambda st: jax.lax.scan(lambda c, x: (c, x + 1), None, st)[1])

    got = list(eval_stream(iter(chunks), lambda c: c["images"], single,
                           multi_call=lambda s: multi(jnp.asarray(s)),
                           k=2, depth=2))
    assert [m["id"] for m, _ in got] == [0, 1, 2]
    assert single_calls == [(3, 2)]
    np.testing.assert_allclose(np.asarray(got[2][1]),
                               np.ones((3, 2), np.float32) + 1)
