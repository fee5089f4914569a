"""Exponential moving averages of parameters, on-device.

Parity: timm ``ModelEmaV2`` (train.py:616-622, updated at :1080-1081) and the
DINO EMA teacher. The EMA tree lives replicated on the mesh and is updated
inside the jitted step (zero host traffic, zero collectives — SURVEY §2
parallelism table)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_update(ema_params, new_params, decay):
    """ema ← decay * ema + (1 - decay) * new, float leaves only."""

    def upd(e, p):
        if jnp.issubdtype(e.dtype, jnp.floating):
            return e * decay + p.astype(e.dtype) * (1.0 - decay)
        return p

    return jax.tree_util.tree_map(upd, ema_params, new_params)


def cosine_momentum_schedule(base: float, final: float, total_steps: int):
    """DINO teacher-momentum schedule: cosine from base to final."""

    def schedule(step):
        t = jnp.clip(step / max(total_steps, 1), 0.0, 1.0)
        return final - (final - base) * (jnp.cos(jnp.pi * t) + 1.0) / 2.0

    return schedule
