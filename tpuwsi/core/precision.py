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


def fp16_policy() -> Policy:
    """fp16 compute (Apex AMP parity, train.py:586-602). fp16 has a 5-bit
    exponent, so pair this with ``DynamicLossScale`` — unlike bf16, small
    gradients underflow without scaling. Provided for checkpoint/numerics
    parity experiments; bf16 is the TPU-native default."""
    return Policy(compute_dtype=jnp.float16)


DEFAULT_POLICY = bf16_policy()


@dataclasses.dataclass(frozen=True)
class DynamicLossScale:
    """torch.cuda.amp.GradScaler-parity dynamic loss scaling as a pure
    functional state (reference: train.py:588-602 loss_scaler).

    Semantics match GradScaler defaults: scale the loss by ``scale`` before
    backward; after unscaling, a non-finite gradient SKIPS the step and
    halves the scale (backoff 0.5); ``growth_interval`` consecutive finite
    steps double it (growth 2.0).
    """

    scale: jnp.ndarray = dataclasses.field(
        default_factory=lambda: jnp.float32(2.0 ** 16)
    )
    growth_factor: float = 2.0
    backoff_factor: float = 0.5
    growth_interval: int = 2000
    good_steps: jnp.ndarray = dataclasses.field(
        default_factory=lambda: jnp.int32(0)
    )

    def scale_loss(self, loss):
        # scale in f32 and STAY f32: the default 2**16 scale cast to an fp16
        # loss dtype overflows to inf (fp16 max 65504), and casting the
        # scaled product back would overflow the same way — the scaled loss
        # exists only to feed the backward, which is dtype-correct either
        # way (review finding r3-s3)
        return loss.astype(jnp.float32) * self.scale

    def unscale(self, grads):
        inv = 1.0 / self.scale
        return jax.tree_util.tree_map(
            lambda g: (g.astype(jnp.float32) * inv).astype(g.dtype), grads
        )

    def grads_finite(self, grads):
        leaves = jax.tree_util.tree_leaves(grads)
        finite = jnp.bool_(True)
        for leaf in leaves:
            finite &= jnp.isfinite(leaf).all()
        return finite

    def update(self, finite):
        """New state after a step whose (unscaled) grads were `finite`."""
        grew = self.good_steps + 1 >= self.growth_interval
        new_scale = jnp.where(
            finite,
            jnp.where(grew, self.scale * self.growth_factor, self.scale),
            self.scale * self.backoff_factor,
        )
        new_good = jnp.where(finite & ~grew, self.good_steps + 1, 0)
        return dataclasses.replace(
            self, scale=new_scale, good_steps=new_good
        )


jax.tree_util.register_dataclass(
    DynamicLossScale,
    data_fields=["scale", "good_steps"],
    meta_fields=["growth_factor", "backoff_factor", "growth_interval"],
)


def apply_if_finite(finite, new_tree, old_tree):
    """Select new_tree when grads were finite, else keep old_tree (the
    GradScaler 'skip step on inf/nan' behavior)."""
    return jax.tree_util.tree_map(
        lambda n, o: jnp.where(finite, n, o), new_tree, old_tree
    )
