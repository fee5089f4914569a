"""MIL head training over frozen tile embeddings + score export.

Parity: the downstream-MIL workflow the reference's datasets feed
(SURVEY §3.4) and utils_MIL.py:1502-1600 ``save_all_slides_and_models_data``
— per-slide tile scores and attention weights before/after softmax exported
to xlsx.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pandas as pd

from tpuwsi.models.mil import GatedAttentionMIL
from tpuwsi.train.losses import cross_entropy
from tpuwsi.train.metrics import accuracy_topk, auc_score
from tpuwsi.train.state import TrainState, create_train_state


def make_mil_train_step(model: GatedAttentionMIL, tx: optax.GradientTransformation):
    def step(state: TrainState, batch):
        def loss_fn(params):
            logits = model.apply(params, batch["features"], batch["mask"])
            return cross_entropy(logits, batch["labels"]), logits

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        probs = jax.nn.softmax(logits, axis=-1)
        metrics = {
            "loss": loss,
            "acc": accuracy_topk(logits, batch["labels"]),
            "auc": auc_score(probs[:, 1], batch["labels"]),
        }
        return state.replace(step=state.step + 1, params=params,
                             opt_state=opt_state), metrics

    return step


def make_mil_eval_fwds(model, steps_per_dispatch: int):
    """Build the jitted eval forwards for ``evaluate_mil`` ONCE per run:
    ``(fwd, multi_fwd)`` where multi_fwd is the lax.scan'd K-batch variant
    (None for steps_per_dispatch<=1). train_mil_head calls evaluate_mil
    every epoch — rebuilding the jit wrappers there retraced the scanned
    eval each epoch, which for the tiny dispatch-bound MIL head cost more
    than the dispatch overhead the scan amortizes (advisor round-4)."""
    fwd = jax.jit(
        lambda p, f, m: jax.nn.softmax(model.apply(p, f, m), axis=-1))
    multi_fwd = None
    if steps_per_dispatch > 1:
        multi_fwd = jax.jit(lambda p, fm: jax.lax.scan(
            lambda c, b: (c, jax.nn.softmax(
                model.apply(p, b["features"], b["mask"]), axis=-1)),
            None, fm)[1])
    return fwd, multi_fwd


def evaluate_mil(model, state, dataset, batch_size: int = 16, seed: int = 0,
                 steps_per_dispatch: int = 1, fwds=None):
    """Slide-level eval over a FeaturesMILDataset: deterministic-order full
    pass, per-bag class-1 prob → AUC/accuracy (the MIL analogue of the
    reference's slide-level validate, train.py:1334-1338).

    The MIL head is tiny (512→128 GEMMs): per-batch dispatch overhead
    dominates device compute, so ``steps_per_dispatch > 1`` scans k batches
    per dispatch (infer/pipeline.eval_stream). ``fwds``: pass the result
    of ``make_mil_eval_fwds`` when calling in a loop (train_mil_head does)
    to avoid a retrace per call; one-shot callers may omit it."""
    from tpuwsi.infer.aggregate import roc_auc
    from tpuwsi.infer.pipeline import eval_stream

    rng = np.random.default_rng(seed)
    probs, labels = [], []
    fwd, multi_fwd = fwds or make_mil_eval_fwds(model, steps_per_dispatch)
    multi = None
    if multi_fwd is not None:
        multi = lambda fm: multi_fwd(
            state.params, jax.tree_util.tree_map(jnp.asarray, fm))
    stream = eval_stream(
        dataset.bags(rng, batch_size, shuffle=False),
        lambda b: {"features": b["features"], "mask": b["mask"]},
        lambda fm: fwd(state.params, jnp.asarray(fm["features"]),
                       jnp.asarray(fm["mask"])),
        multi_call=multi, k=steps_per_dispatch,
    )
    for batch, p in stream:
        p = np.asarray(p)
        probs.extend(p[:, 1].tolist())
        labels.extend(np.asarray(batch["labels"]).tolist())
    out = {
        "eval_acc": float(
            np.mean((np.asarray(probs) > 0.5) == np.asarray(labels))
        ),
        "eval_n_slides": len(labels),
    }
    if len(set(labels)) == 2:
        out["eval_auc"] = roc_auc(probs, labels)
    return out


def train_mil_head(
    dataset,
    num_classes: int = 2,
    hidden_dim: int = 128,
    epochs: int = 20,
    batch_size: int = 16,
    lr: float = 1e-3,
    seed: int = 0,
    eval_dataset=None,
    log_fn: Optional[Callable] = None,
    steps_per_dispatch: int = 1,
):
    """Train a gated-attention MIL head over a FeaturesMILDataset.

    ``eval_dataset``: optional held-out FeaturesMILDataset — evaluated every
    epoch (slide-level AUC/acc merged into the logged metrics).

    ``steps_per_dispatch``: scan k optimizer steps per device dispatch.
    The MIL head's GEMMs are microseconds of device work, so the per-call
    dispatch overhead dominates the epoch; scanning amortizes it k-fold
    with IDENTICAL step semantics (same batch order — full-size batches
    scan, the ragged tail batch steps per-call after them, in order)."""
    rng = np.random.default_rng(seed)
    first = next(dataset.bags(rng, batch_size))
    model = GatedAttentionMIL(hidden_dim=hidden_dim, num_classes=num_classes)
    params = model.init(
        jax.random.PRNGKey(seed),
        jnp.asarray(first["features"]),
        jnp.asarray(first["mask"]),
    )
    tx = optax.adamw(lr)
    state = create_train_state(params, tx)
    step_inner = make_mil_train_step(model, tx)
    step = jax.jit(step_inner)
    eval_fwds = None
    multi = None
    if steps_per_dispatch > 1:
        def _multi(st, batches):
            st, ms = jax.lax.scan(step_inner, st, batches)
            return st, jax.tree_util.tree_map(lambda x: x[-1], ms)

        multi = jax.jit(_multi)
    for epoch in range(epochs):
        metrics = {}
        if multi is None:
            for batch in dataset.bags(rng, batch_size):
                state, metrics = step(
                    state, jax.tree_util.tree_map(jnp.asarray, batch)
                )
        else:
            buf, tail = [], None
            for batch in dataset.bags(rng, batch_size):
                if len(batch["labels"]) == batch_size:
                    buf.append(batch)
                    if len(buf) == steps_per_dispatch:
                        stacked = jax.tree_util.tree_map(
                            lambda *xs: jnp.asarray(np.stack(xs)), *buf)
                        state, metrics = multi(state, stacked)
                        buf = []
                else:
                    tail = batch  # bags() yields the ragged batch last
            for b in buf:  # leftover full-size batches, original order
                state, metrics = step(
                    state, jax.tree_util.tree_map(jnp.asarray, b))
            if tail is not None:
                state, metrics = step(
                    state, jax.tree_util.tree_map(jnp.asarray, tail))
        metrics = {k: float(v) for k, v in metrics.items()}
        if eval_dataset is not None:
            if eval_fwds is None:  # built once, reused every epoch
                eval_fwds = make_mil_eval_fwds(model, steps_per_dispatch)
            metrics.update(
                evaluate_mil(model, state, eval_dataset, batch_size, seed,
                             steps_per_dispatch=steps_per_dispatch,
                             fwds=eval_fwds)
            )
        if log_fn:
            log_fn(epoch, metrics)
    return model, state


def export_slide_scores_xlsx(
    out_path: str,
    slide_names,
    slide_scores,
    targets,
    tile_scores_list,
    attention_before_list=None,
    attention_after_list=None,
):
    """save_all_slides_and_models_data parity (utils_MIL.py:1502-1600):
    one sheet of per-slide rows; tile scores and attention weights
    (pre/post softmax) in numbered columns."""
    from tpuwsi.utils.minixlsx import write_xlsx

    max_tiles = max(len(t) for t in tile_scores_list)
    rows = []
    for i, name in enumerate(slide_names):
        row = {
            "slide_name": name,
            "slide_score": float(slide_scores[i]),
            "target": int(targets[i]),
        }
        for j in range(max_tiles):
            row[f"tile_score_{j}"] = (
                float(tile_scores_list[i][j]) if j < len(tile_scores_list[i]) else None
            )
        if attention_before_list is not None:
            for j in range(max_tiles):
                row[f"attn_before_{j}"] = (
                    float(attention_before_list[i][j])
                    if j < len(attention_before_list[i])
                    else None
                )
        if attention_after_list is not None:
            for j in range(max_tiles):
                row[f"attn_after_{j}"] = (
                    float(attention_after_list[i][j])
                    if j < len(attention_after_list[i])
                    else None
                )
        rows.append(row)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    write_xlsx(out_path, pd.DataFrame(rows))
