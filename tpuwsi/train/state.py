"""Train state pytree."""

from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax
import optax


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any
    ema_params: Optional[Any] = None
    batch_stats: Optional[Any] = None
    # EMA of the BatchNorm running statistics: timm ModelEmaV2 averages the
    # FULL state_dict including running_mean/var (reference train.py:616-622),
    # so EMA eval must pair EMA weights with EMA stats.
    ema_batch_stats: Optional[Any] = None


def create_train_state(params, tx: optax.GradientTransformation, ema: bool = False,
                       batch_stats=None) -> TrainState:
    import jax.numpy as jnp

    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        ema_params=params if ema else None,  # jax arrays are immutable
        batch_stats=batch_stats,
        ema_batch_stats=batch_stats if ema else None,
    )
