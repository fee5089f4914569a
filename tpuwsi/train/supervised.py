"""Supervised tile-classification training step.

Parity: ``train_one_epoch`` / ``validate`` (train.py:988-1143, 1146-1345) and
the vanilla timm path (timm_train.py:817-948), rebuilt as jitted SPMD steps:

- augmentation runs ON DEVICE inside the step (vs the reference's CPU
  DataLoader workers, SURVEY §3.2) — the input batch is raw uint8 tiles;
- batch is sharded over the mesh's data axis, params replicated; gradient
  all-reduce is inserted by GSPMD (replaces DDP/NCCL, SURVEY §5.8);
- loss/AUC/accuracy are computed on device (no per-step host sync — the
  reference calls sklearn roc_auc_score on CPU every batch, train.py:1054);
- EMA update on device (ModelEmaV2 parity, train.py:1080).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from tpuwsi.core.mesh import replicated_sharding
from tpuwsi.train.ema import ema_update
from tpuwsi.train.losses import cross_entropy
from tpuwsi.train.metrics import accuracy_topk, auc_score
from tpuwsi.train.state import TrainState


def make_train_step(
    apply_fn: Callable,
    tx: optax.GradientTransformation,
    augment_fn: Optional[Callable] = None,
    loss_fn: Callable = cross_entropy,
    ema_decay: Optional[float] = None,
    compute_auc: bool = True,
    mix_fn: Optional[Callable] = None,
    soft_loss_fn: Optional[Callable] = None,
    use_batch_stats: bool = False,
):
    """Build the jit-able train step.

    apply_fn(params, images, rngs=...) → logits.
    use_batch_stats: BatchNorm models (resnet50) — the forward runs with
    ``mutable=['batch_stats']`` against ``state.batch_stats`` and the
    updated statistics are threaded back into the state (torch semantics:
    running stats update on every train forward, no gradients).
    augment_fn(key, uint8_images) → normalised float images (or None if the
    batch is already preprocessed).
    mix_fn(key, images, labels) → (mixed_images, soft_targets): the timm
    Mixup/CutMix hook (timm_train.py:585-612) — applied post-augmentation;
    the loss switches to ``soft_loss_fn`` (default soft-target CE; the CLI
    passes sigmoid BCE under --bce-loss, timm BinaryCrossEntropy) while
    acc/AUC metrics stay against the hard labels.
    """
    if mix_fn is not None and soft_loss_fn is None:
        from tpuwsi.train.losses import soft_target_cross_entropy

        soft_loss_fn = soft_target_cross_entropy

    def step(state: TrainState, batch, rng):
        images, labels = batch["images"], batch["labels"]
        rng = jax.random.fold_in(rng, state.step)
        aug_key, mix_key, drop_key = jax.random.split(rng, 3)
        if augment_fn is not None:
            images = augment_fn(aug_key, images)
        soft_targets = None
        if mix_fn is not None:
            if labels.ndim != 1:
                raise ValueError(
                    "mix_fn needs (B,) labels — multi-target (B, T) label "
                    "matrices cannot be mixup-one-hotted (see cli guard)"
                )
            images, soft_targets = mix_fn(mix_key, images, labels)

        def compute_loss(params):
            if use_batch_stats:
                logits, mut = apply_fn(
                    {**params, "batch_stats": state.batch_stats}, images,
                    deterministic=False, mutable=["batch_stats"],
                    rngs={"dropout": drop_key, "droppath": drop_key},
                )
                new_stats = mut["batch_stats"]
            else:
                logits = apply_fn(
                    params, images, deterministic=False,
                    rngs={"dropout": drop_key, "droppath": drop_key},
                )
                new_stats = None
            if soft_targets is not None:
                return soft_loss_fn(logits, soft_targets), (logits, new_stats)
            return loss_fn(logits, labels), (logits, new_stats)

        (loss, (logits, new_stats)), grads = jax.value_and_grad(
            compute_loss, has_aux=True
        )(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = state.ema_params
        new_ema_stats = state.ema_batch_stats
        if state.ema_params is not None and ema_decay is not None:
            new_ema = ema_update(state.ema_params, new_params, ema_decay)
            if new_stats is not None and state.ema_batch_stats is not None:
                # ModelEmaV2 averages running stats with the weights
                new_ema_stats = ema_update(
                    state.ema_batch_stats, new_stats, ema_decay
                )
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            ema_params=new_ema,
            batch_stats=new_stats if new_stats is not None else state.batch_stats,
            ema_batch_stats=new_ema_stats,
        )
        if logits.shape[0] != labels.shape[0]:
            # --aug-splits concat batch (N*B logits, B labels): step
            # metrics score the clean split, like the JSD loss's CE term
            logits = logits[: labels.shape[0]]
        if labels.ndim == 2:
            # multi-target ('+'-joined, datasets.py:55-61): step metrics
            # report the FIRST target's head; -1 (unknown) labels masked
            lm = labels[:, 0]
            lmask = lm >= 0
            lsafe = jnp.maximum(lm, 0)
            logits_m = logits[:, :2]
        else:
            lm = lsafe = labels
            lmask = None
            logits_m = logits
        probs = jax.nn.softmax(logits_m.astype(jnp.float32), axis=-1)
        metrics = {
            "loss": loss,
            "acc": accuracy_topk(logits_m, lsafe, k=1, mask=lmask),
        }
        if compute_auc and logits_m.shape[-1] >= 2:
            metrics["auc"] = auc_score(probs[:, 1], lsafe, mask=lmask)
        return new_state, metrics

    return step


def make_eval_step(
    apply_fn: Callable,
    preprocess_fn: Optional[Callable] = None,
    use_ema: bool = False,
):
    """Eval step: logits + softmax for tile batches (masked for padding)."""

    def step(state: TrainState, batch):
        images = batch["images"]
        if preprocess_fn is not None:
            images = preprocess_fn(images)
        ema = use_ema and state.ema_params is not None
        params = state.ema_params if ema else state.params
        if state.batch_stats is not None:
            # BN models evaluate on the running statistics — the EMA'd copy
            # under EMA eval (ModelEmaV2 averages the full state_dict)
            stats = (
                state.ema_batch_stats
                if ema and state.ema_batch_stats is not None
                else state.batch_stats
            )
            params = {**params, "batch_stats": stats}
        logits = apply_fn(params, images, deterministic=True)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        return logits, probs

    return step


def make_multi_eval_step(step_fn):
    """Scan a (state, batch) eval step over a stacked super-batch.

    The serving-side analogue of ``make_multi_step``: the batch pytree
    carries a leading K axis of padded eval chunks, and one jitted dispatch
    runs all K forwards on-device (``--eval-steps-per-dispatch``). State is
    loop-invariant (eval mutates nothing), so it rides the closure carry.
    Returns the stacked outputs (leading axis K). Amortizes the per-call
    dispatch+fetch overhead of the serving loops (measured ~21 ms/call vs
    ~26.5 ms of b256 ViT-S eval compute on the tunneled chip —
    infer/pipeline.py header)."""

    def multi(state, batches):
        def body(carry, b):
            return carry, step_fn(state, b)

        _, outs = jax.lax.scan(body, None, batches)
        return outs

    return multi


def make_multi_step(step_fn):
    """Scan ``step_fn(state, batch, rng)`` over a stacked super-batch.

    The bench's K-step on-device driver (bench.py), productionized for the
    CLI loops (--steps-per-dispatch): the batch pytree carries a leading
    steps axis — ``lax.scan`` runs one jitted dispatch per N optimizer
    steps, amortizing per-call dispatch latency (measured ~7 ms/step on the
    tunneled v5e; sub-ms but nonzero on TPU VMs). Per-step RNG decorrelation
    comes from the step's own ``fold_in(rng, state.step)``. Returns the LAST
    step's metrics (same sampling semantics as reading metrics every
    ``--log-interval`` steps)."""

    def multi(state, batches, rng):
        def body(st, b):
            return step_fn(st, b, rng)

        state, ms = jax.lax.scan(body, state, batches)
        return state, jax.tree_util.tree_map(lambda x: x[-1], ms)

    return multi


def compile_step(step_fn, mesh, state: TrainState, donate: bool = True,
                 keep_state_sharding: bool = False):
    """jit a (state, batch, rng) step with DP shardings over the mesh.

    The batch pytree keeps whatever sharding the caller placed it with
    (use ``tpuwsi.core.mesh.shard_batch``: batch dim over the data axis);
    state and rng are replicated. GSPMD then inserts the gradient all-reduce
    over ICI (SURVEY §5.8).

    keep_state_sharding: for tensor-parallel states (params placed via
    ``parallel.sharding.shard_params``) — the state keeps the placement it
    arrived with instead of being forced replicated.
    """
    repl = replicated_sharding(mesh)
    state_sh = (
        None if keep_state_sharding
        else jax.tree_util.tree_map(lambda _: repl, state)
    )
    return functools.partial(
        jax.jit,
        in_shardings=(state_sh, None, repl),
        donate_argnums=(0,) if donate else (),
    )(step_fn)
