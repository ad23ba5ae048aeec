"""Losses: weighted softmax cross-entropy and GAN objectives.

sequitr trains its U-Nets with per-pixel weighted softmax cross-entropy
(Ronneberger-style weight maps; SURVEY.md §2 'Losses') and its pix2pix-style
GAN with an adversarial + L1 objective (SURVEY.md §3.4). Reference source
unavailable — formulations below are the standard ones and documented as
spec decisions.

All losses are pure jax, float32, jit/grad-safe.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = [
    "weighted_softmax_cross_entropy",
    "softmax_label_map",
    "sigmoid_bce_with_logits",
    "gan_discriminator_loss",
    "gan_generator_loss",
    "l1_loss",
    "iou",
    "dice",
]


def weighted_softmax_cross_entropy(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Per-pixel weighted softmax cross-entropy, mean-reduced.

    ``logits``: (..., K); ``labels``: integer (...,) or one-hot (..., K);
    ``weights``: optional per-pixel (...,) loss weights (U-Net weight maps).
    Weighted mean: sum(w * ce) / sum(w) so the scale is invariant to the
    weight-map normalization (spec decision).
    """
    logits = logits.astype(jnp.float32)
    k = logits.shape[-1]
    if labels.shape == logits.shape:
        onehot = labels.astype(jnp.float32)
    else:
        onehot = jax.nn.one_hot(labels, k, dtype=jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.sum(onehot * logp, axis=-1)
    if weights is None:
        return jnp.mean(ce)
    w = weights.astype(jnp.float32)
    return jnp.sum(w * ce) / jnp.maximum(jnp.sum(w), 1e-8)


def softmax_label_map(logits: jnp.ndarray) -> jnp.ndarray:
    """Softmax probabilities -> argmax label map (sequitr's output contract).

    Returns (probs, labels): per-pixel class probabilities (float32) and the
    integer label map (SURVEY.md §2 'softmax label maps').
    """
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return probs, jnp.argmax(probs, axis=-1).astype(jnp.int32)


def sigmoid_bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Numerically-stable elementwise binary cross-entropy with logits."""
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    return jnp.mean(
        jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def gan_discriminator_loss(real_logits: jnp.ndarray, fake_logits: jnp.ndarray) -> jnp.ndarray:
    """Vanilla (non-saturating) GAN discriminator loss on patch logits."""
    loss_real = sigmoid_bce_with_logits(real_logits, jnp.ones_like(real_logits))
    loss_fake = sigmoid_bce_with_logits(fake_logits, jnp.zeros_like(fake_logits))
    return 0.5 * (loss_real + loss_fake)


def gan_generator_loss(
    fake_logits: jnp.ndarray,
    fake_images: jnp.ndarray,
    target_images: jnp.ndarray,
    l1_weight: float = 100.0,
) -> jnp.ndarray:
    """pix2pix generator objective: adversarial + lambda * L1.

    ``l1_weight`` default 100 follows the pix2pix paper (spec decision;
    reference hyperparameter unavailable).
    """
    adv = sigmoid_bce_with_logits(fake_logits, jnp.ones_like(fake_logits))
    return adv + l1_weight * l1_loss(fake_images, target_images)


def l1_loss(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))


def iou(pred: jnp.ndarray, target: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """Per-class intersection-over-union of integer label maps, shape (K,).

    Classes absent from both prediction and target get IoU = 1.0 (vacuous).
    The parity bar in BASELINE.json is IoU parity on identical weights.
    """
    ious = []
    for k in range(num_classes):
        p = pred == k
        t = target == k
        inter = jnp.sum(jnp.logical_and(p, t))
        union = jnp.sum(jnp.logical_or(p, t))
        ious.append(jnp.where(union == 0, 1.0, inter / jnp.maximum(union, 1)))
    return jnp.stack(ious).astype(jnp.float32)


def dice(pred: jnp.ndarray, target: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """Per-class Dice coefficient of integer label maps, shape (K,)."""
    scores = []
    for k in range(num_classes):
        p = pred == k
        t = target == k
        inter = jnp.sum(jnp.logical_and(p, t))
        total = jnp.sum(p) + jnp.sum(t)
        scores.append(jnp.where(total == 0, 1.0, 2.0 * inter / jnp.maximum(total, 1)))
    return jnp.stack(scores).astype(jnp.float32)


# ---------------------------------------------------------------------------
# streaming segmentation metrics (host-side numpy)
# ---------------------------------------------------------------------------


def confusion_matrix_np(pred, target, num_classes: int):
    """(K+1, K) int64 confusion counts: rows = target class (row K collects
    out-of-range target labels), cols = predicted class (must be in [0, K)).

    The streaming evaluators accumulate one of these per frame instead of
    buffering every predicted label map: summing matrices over frames then
    applying ``metrics_from_confusion`` reproduces the whole-stack
    ``iou``/``dice``/accuracy exactly (including the vacuous-class = 1.0
    rule and union counts for predictions at malformed target pixels).
    """
    import numpy as np

    k = int(num_classes)
    pred = np.asarray(pred).ravel().astype(np.int64)
    target = np.asarray(target).ravel().astype(np.int64)
    t_row = np.where((target >= 0) & (target < k), target, k)
    return np.bincount(t_row * k + pred, minlength=(k + 1) * k).reshape(
        k + 1, k
    )


def metrics_from_confusion(cm):
    """Per-class IoU/dice + pixel accuracy from a (K+1, K) confusion matrix.

    Matches ``iou``/``dice`` on the concatenated label maps: intersection =
    diagonal, union = target-row + prediction-column - diagonal (the
    prediction column includes the out-of-range-target overflow row, as the
    elementwise definition does), vacuous classes score 1.0.
    """
    import numpy as np

    cm = np.asarray(cm, dtype=np.int64)
    k = cm.shape[1]
    inter = np.diagonal(cm[:k])
    row = cm[:k].sum(axis=1)  # target pixels per class
    col = cm.sum(axis=0)  # predicted pixels per class (incl. overflow row)
    union = row + col - inter
    total = row + col
    ious = np.where(union == 0, 1.0, inter / np.maximum(union, 1))
    dices = np.where(total == 0, 1.0, 2.0 * inter / np.maximum(total, 1))
    accuracy = float(inter.sum()) / max(int(cm.sum()), 1)
    return (
        ious.astype(np.float64),
        dices.astype(np.float64),
        accuracy,
    )
