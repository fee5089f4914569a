"""Mixed-precision policy for TPU.

Replaces the reference's CUDA AMP/Apex loss-scaling machinery
(reference: train.py:586-602 autocast + GradScaler, train.py:49-55 Apex):
TPU bf16 has fp32-range exponent so no loss scaler is needed — compute in
bfloat16 on the MXU, keep params/optimizer state in float32, reduce in fp32.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    output_dtype: jnp.dtype = jnp.float32

    def cast_to_compute(self, tree):
        return jax.tree_util.tree_map(
            lambda x: x.astype(self.compute_dtype)
            if jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            tree,
        )

    def cast_to_param(self, tree):
        return jax.tree_util.tree_map(
            lambda x: x.astype(self.param_dtype)
            if jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            tree,
        )

    def cast_to_output(self, tree):
        return jax.tree_util.tree_map(
            lambda x: x.astype(self.output_dtype)
            if jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            tree,
        )


def bf16_policy() -> Policy:
    return Policy()


def fp32_policy() -> Policy:
    return Policy(compute_dtype=jnp.float32)


DEFAULT_POLICY = bf16_policy()
