"""Explicit JAX RNG streams.

The reference relies on global Python/NumPy/Torch RNG state seeded per-rank
(reference: train.py:467 per-rank seed offset; utils.py:93 ``random.sample``).
Here every source of randomness is an explicit ``jax.random`` key derived from
one root seed, folded over (host, purpose, step) so runs are reproducible and
per-host data sampling is decorrelated without any global state.
"""

from __future__ import annotations

import dataclasses
import hashlib

import jax
import jax.numpy as jnp


def _purpose_to_int(purpose: str) -> int:
    return int.from_bytes(hashlib.sha256(purpose.encode()).digest()[:4], "little")


def fold_host(key: jax.Array, process_index: int | None = None) -> jax.Array:
    """Decorrelate a key per host (the reference's per-rank seed offset)."""
    if process_index is None:
        process_index = jax.process_index()
    return jax.random.fold_in(key, process_index)


@dataclasses.dataclass
class RngStream:
    """A named, step-foldable random stream: key(step) is deterministic."""

    base: jax.Array

    def key(self, step: int | jax.Array) -> jax.Array:
        return jax.random.fold_in(self.base, step)

    def split(self, n: int):
        return jax.random.split(self.base, n)


def make_stream(seed: int, purpose: str, per_host: bool = False) -> RngStream:
    key = jax.random.PRNGKey(seed)
    key = jax.random.fold_in(key, _purpose_to_int(purpose))
    if per_host:
        key = fold_host(key)
    return RngStream(base=key)


def uniform_int(key: jax.Array, maxval: int, shape=()) -> jax.Array:
    return jax.random.randint(key, shape, 0, maxval, dtype=jnp.int32)
