"""Loss functions with reference-parity semantics.

Covers the reference's supervised loss (SimpleTrain.py:16: torch
``cross_entropy`` with inverse-frequency class weights from
``getClassWeight``, TrainingBase.py:12-23) and the MME adversarial entropy
(MMETrainingModule.py:10-11).

Parity note (documented quirk, SURVEY.md §7): the reference's
``forward`` applies the temperature-scaled **softmax** (tiramisu.py:120-125)
and then feeds those *probabilities* to ``torch.nn.functional.cross_entropy``,
which applies ``log_softmax`` again — an (intentional-looking) double
softmax.  ``cross_entropy`` here therefore treats its input as logits
exactly like torch does; callers pass the model's softmax output to get the
reference's training dynamics, or raw logits for the mathematically clean
variant.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def get_class_weight(targets: jax.Array, num_classes: int) -> jax.Array:
    """Inverse-frequency class weights over this batch (TrainingBase.py:12-23).

    torch.reciprocal of per-class pixel counts; absent classes get weight 0
    here instead of inf — torch's inf is never touched because absent
    classes index no pixels, so the losses are identical.
    """
    # one-hot reduction instead of bincount: scatter-adds are TPU-hostile
    # (the XLA scatter lowering serializes); the comparison+sum is pure VPU
    # work and bit-identical for counts < 2^24
    onehot = jax.nn.one_hot(targets.reshape(-1).astype(jnp.int32),
                            num_classes, dtype=jnp.float32)
    counts = jnp.sum(onehot, axis=0)
    return jnp.where(counts > 0, 1.0 / jnp.maximum(counts, 1.0), 0.0)


def cross_entropy(outputs: jax.Array, targets: jax.Array,
                  weight: jax.Array | None = None) -> jax.Array:
    """torch.nn.functional.cross_entropy for (N, H, W, C) vs (N, H, W).

    With ``weight``: loss = sum_i w[y_i]*nll_i / sum_i w[y_i] (torch's
    weighted mean).  Without: plain mean.
    """
    # one-hot contractions instead of take_along_axis / table gathers:
    # per-pixel gathers over the minor class axis measured multi-ms per
    # 64-batch on TPU, while the masked sums fuse into the softmax
    logp = jax.nn.log_softmax(outputs.astype(jnp.float32), axis=-1)
    onehot = jax.nn.one_hot(targets.astype(jnp.int32), outputs.shape[-1],
                            dtype=jnp.float32)
    nll = -jnp.sum(logp * onehot, axis=-1)
    if weight is None:
        return jnp.mean(nll)
    w = jnp.sum(onehot * weight.astype(jnp.float32), axis=-1)
    return jnp.sum(w * nll) / jnp.maximum(jnp.sum(w), 1e-12)


def weighted_cross_entropy(outputs: jax.Array, targets: jax.Array,
                           num_classes: int) -> jax.Array:
    """cross_entropy(outputs, y, weight=getClassWeight(y)) — SimpleTrain.py:16."""
    return cross_entropy(outputs, targets, get_class_weight(targets, num_classes))


def iou_loss_thresholded(outputs: jax.Array, labels: jax.Array,
                         smooth: float = 1e-6) -> jax.Array:
    """Spare thresholded-IoU metric (reference utils/losses.py:5-22,
    unused there too — kept for capability parity). Binary masks
    (N, H, W) -> mean of ceil-thresholded IoU scores."""
    outputs = outputs.astype(bool)
    labels = labels.astype(bool)
    inter = jnp.sum(outputs & labels, axis=(1, 2)).astype(jnp.float32)
    union = jnp.sum(outputs | labels, axis=(1, 2)).astype(jnp.float32)
    iou = (inter + smooth) / (union + smooth)
    return jnp.mean(jnp.ceil(jnp.clip(20 * (iou - 0.5), 0, 10)) / 10)


def dice_loss(pred: jax.Array, target: jax.Array,
              smooth: float = 1.0) -> jax.Array:
    """Spare differentiable dice loss (reference utils/losses.py:25-41)."""
    p = pred.reshape(-1)
    t = target.reshape(-1)
    inter = jnp.sum(p * t)
    return 1.0 - (2.0 * inter + smooth) / (jnp.sum(t * p) + jnp.sum(t * t) + smooth)


def adentropy(probs: jax.Array, lamda: float = 1.0) -> jax.Array:
    """MME adversarial entropy (MMETrainingModule.py:10-11).

    ``lamda * mean over (N,H,W) of sum_c p*log(p + 1e-5)`` — the *negative*
    entropy; minimized through grad_reverse it maximizes classifier entropy
    on unlabelled target frames.
    """
    return lamda * jnp.mean(jnp.sum(probs * jnp.log(probs + 1e-5), axis=-1))
