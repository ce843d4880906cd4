"""Segmentation metrics with reference-parity semantics.

The reference used pytorch-lightning 1.x functional metrics
(rightLaneNetwork/trainingModules/TrainingBase.py:5 — ``accuracy,
dice_score, iou``; rightLaneNetwork/test.py:10 adds ``confusion_matrix``)
and a weighted-by-batch-size epoch aggregation
(TrainingBase.py:79-110).  Those exact semantics are reproduced here as
jittable jnp ops:

- ``accuracy``: plain micro accuracy, mean(pred == target).
- ``dice_score``: mean over *foreground* classes 1..C-1 of per-class dice
  2tp/(2tp+fp+fn); a class absent from the target scores 0 (``no_fg_score``),
  a present class with zero denominator scores 0 (``nan_score``).
- ``iou``: from the confusion matrix, per-class I/U with classes where
  union == 0 scoring 0 (``absent_score``) — and, matching PL's
  ``get_num_classes`` inference, averaged over ``max(pred,target)+1``
  classes (a dynamic count; handled with masking under jit).
- ``confusion_matrix``: rows = label, cols = prediction, raw counts.

All take integer class maps (any shape); probabilities are argmaxed by the
caller (``evaluate_outputs``).
"""
from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp


def accuracy(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean((pred == target).astype(jnp.float32))


def confusion_matrix(pred: jax.Array, target: jax.Array, num_classes: int) -> jax.Array:
    """Confusion matrix; rows = target (label), cols = pred."""
    # cm[t, p] = onehot_t^T @ onehot_p — a bincount scatter-add here is
    # TPU-hostile (serialized scatter lowering); the one-hot contraction is
    # one MXU matmul and exact (0/1 products, f32 accumulation, counts < 2^24)
    onehot_t = jax.nn.one_hot(target.reshape(-1).astype(jnp.int32),
                              num_classes, dtype=jnp.float32)
    onehot_p = jax.nn.one_hot(pred.reshape(-1).astype(jnp.int32),
                              num_classes, dtype=jnp.float32)
    return jnp.einsum("nt,np->tp", onehot_t, onehot_p).astype(jnp.int32)


def iou(pred: jax.Array, target: jax.Array, num_classes: int) -> jax.Array:
    """Mean IoU with PL-1.x semantics (dynamic class-count inference)."""
    cm = confusion_matrix(pred, target, num_classes).astype(jnp.float32)
    inter = jnp.diagonal(cm)
    union = cm.sum(0) + cm.sum(1) - inter
    scores = jnp.where(union > 0, inter / jnp.maximum(union, 1.0), 0.0)
    # PL inferred num_classes = max over data + 1; average over that many.
    n = jnp.maximum(jnp.max(pred), jnp.max(target)).astype(jnp.int32) + 1
    mask = jnp.arange(num_classes) < n
    return jnp.sum(jnp.where(mask, scores, 0.0)) / n.astype(jnp.float32)


def dice_score(pred: jax.Array, target: jax.Array, num_classes: int) -> jax.Array:
    """Mean foreground dice with PL-1.x semantics (background excluded)."""
    cm = confusion_matrix(pred, target, num_classes).astype(jnp.float32)
    tp = jnp.diagonal(cm)
    fp = cm.sum(0) - tp
    fn = cm.sum(1) - tp
    denom = 2 * tp + fp + fn
    support = cm.sum(1)  # class pixels in target
    per_class = jnp.where(support > 0,
                          jnp.where(denom > 0, 2 * tp / jnp.maximum(denom, 1.0), 0.0),
                          0.0)
    return jnp.mean(per_class[1:])


def evaluate_outputs(probas: jax.Array, target: jax.Array, loss: jax.Array,
                     num_classes: int) -> Dict[str, jax.Array]:
    """Per-batch evaluation dict matching TrainingBase.evaluate_batch:79-95.

    Each metric is pre-multiplied by the batch size (``weight``) so epochs
    aggregate with ``summarize_weighted``.

    Args:
      probas: (N, H, W, C) class probabilities (or logits — argmax invariant).
      target: (N, H, W) int labels.
      loss:   scalar batch loss.
    """
    pred = jnp.argmax(probas, axis=-1).astype(jnp.int32)
    target = target.astype(jnp.int32)
    w = jnp.float32(probas.shape[0])
    return {
        "loss": loss * w,
        "acc": accuracy(pred, target) * w,
        "dice": dice_score(pred, target, num_classes) * w,
        "iou": iou(pred, target, num_classes) * w,
        "weight": w,
    }


def summarize_weighted(outputs: List[Dict[str, jax.Array]]) -> Dict[str, float]:
    """Weighted epoch aggregation matching TrainingBase.summarize_evaluation_results:97-110.

    acc and iou are scaled by 100 exactly as the reference logs them.
    """
    total = float(sum(float(o["weight"]) for o in outputs))
    s = lambda k: float(sum(float(o[k]) for o in outputs)) / total
    return {
        "loss": s("loss"),
        "acc": s("acc") * 100.0,
        "dice": s("dice"),
        "iou": s("iou") * 100.0,
    }
