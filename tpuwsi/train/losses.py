"""Loss functions.

Parity: the reference's loss surface — timm cross-entropy with label smoothing
(train.py:637-662 ``--smoothing``), BCE (``--bce-loss``), JSD (``--jsd-loss``),
soft-target CE (mixup path), and the GipMed ``FocalLoss`` γ=2
(utils.py:668-679). All are plain jit-able functions over logits.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def cross_entropy(logits, labels, smoothing: float = 0.0, weights=None):
    """labels: int (B,). Optional label smoothing and per-sample weights."""
    num_classes = logits.shape[-1]
    one_hot = jax.nn.one_hot(labels, num_classes)
    if smoothing > 0.0:
        one_hot = one_hot * (1.0 - smoothing) + smoothing / num_classes
    losses = optax.softmax_cross_entropy(logits, one_hot)
    if weights is not None:
        losses = losses * weights
    return losses.mean()


def soft_target_cross_entropy(logits, target_probs):
    return optax.softmax_cross_entropy(logits, target_probs).mean()


def binary_cross_entropy(logits, labels, smoothing: float = 0.0,
                         target_thresh=None):
    """timm BCE-loss path: per-class sigmoid BCE on one-hot targets.

    ``target_thresh`` is timm's --bce-target-thresh (BinaryCrossEntropy
    target_threshold): after smoothing/mixing, soft targets are re-binarized
    by the threshold."""
    num_classes = logits.shape[-1]
    one_hot = jax.nn.one_hot(labels, num_classes)
    if smoothing > 0.0:
        one_hot = one_hot * (1.0 - smoothing) + smoothing / num_classes
    if target_thresh is not None:
        one_hot = (one_hot > target_thresh).astype(logits.dtype)
    return optax.sigmoid_binary_cross_entropy(logits, one_hot).mean()


def binary_cross_entropy_soft(logits, soft_targets, target_thresh=None):
    """Sigmoid BCE on mixed/soft targets — timm BinaryCrossEntropy under
    Mixup/CutMix, where --bce-target-thresh re-binarizes the mixed target."""
    if target_thresh is not None:
        soft_targets = (soft_targets > target_thresh).astype(logits.dtype)
    return optax.sigmoid_binary_cross_entropy(logits, soft_targets).mean()


def focal_loss(logits, labels, gamma: float = 2.0, alpha=None):
    """FocalLoss parity (utils.py:668-679): CE scaled by (1 - p_t)^γ."""
    log_probs = jax.nn.log_softmax(logits)
    labels_oh = jax.nn.one_hot(labels, logits.shape[-1])
    log_pt = jnp.sum(labels_oh * log_probs, axis=-1)
    pt = jnp.exp(log_pt)
    loss = -((1.0 - pt) ** gamma) * log_pt
    if alpha is not None:
        alpha_t = jnp.asarray(alpha)[labels]
        loss = alpha_t * loss
    return loss.mean()


def jsd_cross_entropy(logits, labels, num_splits=3, alpha=12.0,
                      smoothing=0.0):
    """timm JsdCrossEntropy (the AugMix --jsd-loss protocol,
    timm_train.py:614-663): ``logits`` is the concatenation of
    ``num_splits`` augmentation splits of the same B samples along the
    batch axis (split 0 = clean). Smoothed CE on the clean split plus
    alpha x the mean KL(p_i || mean-of-p) Jensen-Shannon consistency term
    across all splits (torch: F.kl_div(logp_mixture, p_split,
    reduction='batchmean'))."""
    b = logits.shape[0] // num_splits
    splits = [logits[i * b:(i + 1) * b] for i in range(num_splits)]
    ce = cross_entropy(splits[0], labels[:b], smoothing)
    probs = [jax.nn.softmax(l.astype(jnp.float32)) for l in splits]
    mix = jnp.clip(sum(probs) / num_splits, 1e-7, 1.0)
    log_mix = jnp.log(mix)
    kl = sum(
        jnp.sum(p * (jnp.log(jnp.clip(p, 1e-7, 1.0)) - log_mix), axis=-1).mean()
        for p in probs
    )
    return ce + alpha * kl / num_splits


def cox_partial_likelihood(risk_scores, times, events):
    """Censored-survival loss for the survival dataset family
    (datasets.py:2354-3461 targets: time, censored flag).

    Breslow tie handling: the risk set for event i is {j : t_j >= t_i}
    INCLUDING tied event times, computed with an explicit (B, B) mask so the
    result is deterministic and sort-order independent (a prefix-cumlogsumexp
    over a descending sort would let argsort tie-breaking decide whether a
    tied subject's own ties enter its denominator). O(B^2) but B is a
    training batch; XLA fuses the masked logsumexp.
    """
    risk = risk_scores.reshape(-1).astype(jnp.float32)
    times = times.reshape(-1)
    ev = events.reshape(-1).astype(jnp.float32)
    in_risk_set = times[None, :] >= times[:, None]  # row i: risk set of i
    log_denom = jax.scipy.special.logsumexp(
        risk[None, :], b=in_risk_set.astype(jnp.float32), axis=1
    )
    return -jnp.sum((risk - log_denom) * ev) / jnp.maximum(ev.sum(), 1.0)


def multi_target_cross_entropy(logits, labels, smoothing: float = 0.0):
    """Multi-target training (datasets.py:55-61 '+'-joined targets): logits
    (B, T*2) = T independent binary heads; labels (B, T) with -1 = unknown
    (masked out, matching the reference's manual timm loss-gather patch,
    train_instruct.txt:3-8)."""
    b, t = labels.shape
    logits = logits.reshape(b, t, 2)
    mask = labels >= 0
    safe = jnp.maximum(labels, 0)
    one_hot = jax.nn.one_hot(safe, 2)
    if smoothing > 0.0:
        one_hot = one_hot * (1.0 - smoothing) + smoothing / 2.0
    ce = optax.softmax_cross_entropy(logits, one_hot)  # (B, T)
    return jnp.sum(ce * mask) / jnp.maximum(mask.sum(), 1)


LOSS_REGISTRY = {
    "ce": cross_entropy,
    "bce": binary_cross_entropy,
    "focal": focal_loss,
    "soft_ce": soft_target_cross_entropy,
    "jsd": jsd_cross_entropy,
    "cox": cox_partial_likelihood,
    "multi_ce": multi_target_cross_entropy,
}
