"""Survival training steps (censored regression).

The reference datasets emit Binary Target / Time Target / Censored
(datasets.py:2709-2719); the training objectives live in the lab's sibling
repos. Here both standard choices are provided as jitted steps:
- 'cox': negative Cox partial likelihood over the batch risk set
  (tpuwsi.train.losses.cox_partial_likelihood);
- 'binary': cross-entropy on the 5-year binary status, masking unknown (-1)
  targets (the reference's Survival_Binary pathway).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from tpuwsi.train.losses import cox_partial_likelihood
from tpuwsi.train.metrics import auc_score
from tpuwsi.train.state import TrainState


def concordance_index(risk, times, events):
    """Harrell's C-index on device: fraction of comparable pairs ordered
    correctly (higher risk → shorter survival)."""
    t_i = times[:, None]
    t_j = times[None, :]
    e_i = events[:, None]
    comparable = (t_i < t_j) & (e_i > 0)
    correct = (risk[:, None] > risk[None, :]) & comparable
    ties = (risk[:, None] == risk[None, :]) & comparable
    n = comparable.sum()
    return jnp.where(
        n > 0, (correct.sum() + 0.5 * ties.sum()) / jnp.maximum(n, 1), 0.5
    )


def make_survival_train_step(
    apply_fn: Callable,
    tx: optax.GradientTransformation,
    mode: str = "cox",
    augment_fn: Optional[Callable] = None,
):
    def step(state: TrainState, batch, rng):
        images = batch["images"]
        rng = jax.random.fold_in(rng, state.step)
        aug_key, drop_key = jax.random.split(rng)
        if augment_fn is not None:
            images = augment_fn(aug_key, images)

        def loss_fn(params):
            out = apply_fn(
                params, images, deterministic=False,
                rngs={"dropout": drop_key, "droppath": drop_key},
            )
            if mode == "cox":
                risk = out[:, 0] if out.ndim > 1 else out
                events = 1.0 - batch["censored"].astype(jnp.float32)
                loss = cox_partial_likelihood(
                    risk.astype(jnp.float32), batch["time_targets"], events
                )
                return loss, risk
            # binary: CE on 5-yr status, masking unknown (-1)
            labels = batch["binary_targets"]
            mask = labels >= 0
            logp = jax.nn.log_softmax(out.astype(jnp.float32), axis=-1)
            safe_labels = jnp.maximum(labels, 0)
            nll = -jnp.take_along_axis(logp, safe_labels[:, None], axis=-1)[:, 0]
            loss = jnp.sum(nll * mask) / jnp.maximum(mask.sum(), 1)
            return loss, out

        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss}
        if mode == "cox":
            events = 1.0 - batch["censored"].astype(jnp.float32)
            metrics["c_index"] = concordance_index(
                out.astype(jnp.float32), batch["time_targets"], events
            )
        else:
            probs = jax.nn.softmax(out.astype(jnp.float32), axis=-1)
            metrics["auc"] = auc_score(
                probs[:, 1], batch["binary_targets"],
                mask=batch["binary_targets"] >= 0,
            )
        return state.replace(
            step=state.step + 1, params=params, opt_state=opt_state
        ), metrics

    return step
