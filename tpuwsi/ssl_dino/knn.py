"""Weighted kNN evaluation over frozen features (the standard DINO probe).

The reference evaluates SSL quality downstream via finetuning/MIL; the DINO
literature's k-NN probe is the cheap in-training signal — provided here as a
jit-able evaluation over extracted tile features.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def knn_classify(
    train_feats: jax.Array,  # (N, D)
    train_labels: jax.Array,  # (N,)
    test_feats: jax.Array,  # (M, D)
    k: int = 20,
    temperature: float = 0.07,
    num_classes: int | None = None,
) -> jax.Array:
    """Temperature-weighted cosine kNN. Returns the PAIR
    ``(predicted_labels (M,), class_probabilities (M, C))`` — destructure it
    (see ``knn_accuracy``); the probabilities feed AUC computations.

    ``num_classes=None`` (default) infers ``max(train_labels)+1`` from the
    concrete labels — only valid OUTSIDE jit (the host-side probes). Under
    jit pass it explicitly. (A hardcoded default of 2 silently clamped
    every >2-class probe to a 2-class argmax — the 8-class SSL-slice probe
    could never score above 2/C under it.)"""
    if num_classes is None:
        num_classes = int(jnp.max(train_labels)) + 1
    tr = train_feats / (jnp.linalg.norm(train_feats, axis=1, keepdims=True) + 1e-12)
    te = test_feats / (jnp.linalg.norm(test_feats, axis=1, keepdims=True) + 1e-12)
    sim = te @ tr.T  # (M, N)
    k = min(k, tr.shape[0])
    top_sim, top_idx = jax.lax.top_k(sim, k)
    top_labels = train_labels[top_idx]  # (M, k)
    weights = jnp.exp(top_sim / temperature)
    one_hot = jax.nn.one_hot(top_labels, num_classes)  # (M, k, C)
    scores = jnp.einsum("mk,mkc->mc", weights, one_hot)
    return jnp.argmax(scores, axis=1), jax.nn.softmax(
        jnp.log(scores + 1e-12), axis=1
    )


def knn_accuracy(train_feats, train_labels, test_feats, test_labels, k=20,
                 num_classes: int | None = None) -> float:
    preds, _ = knn_classify(
        train_feats, train_labels, test_feats, k=k, num_classes=num_classes
    )
    return float(jnp.mean(preds == test_labels))
