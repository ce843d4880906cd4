"""Optimizers with torch-exact update rules, lr passed per step.

torch steps its LR scheduler per epoch and its optimizer per batch; to keep
one compiled train step across the whole run, the learning rate enters the
jitted step as a scalar argument instead of an optax schedule-by-count.

- ``adamw``: torch AdamW — p -= lr * (m̂/(√v̂+eps) + wd*p)
  (reference SimpleTrain.py:28, MMETrainingModule.py:16).
- ``sgd_nesterov``: torch SGD(momentum=0.9, nesterov=True, weight_decay) —
  g' = g + wd*p;  buf = μ*buf + g';  update = g' + μ*buf;  p -= group_lr *
  update, with per-parameter-group lr factors (the MME min-step uses lr/3
  on the feature extractor and lr on the classifier,
  reference MMETrainingModule.py:17-20).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax


def adamw(weight_decay: float, b1: float = 0.9, b2: float = 0.999,
          eps: float = 1e-8) -> optax.GradientTransformation:
    """Returns a transform producing un-scaled updates; caller multiplies by -lr."""
    return optax.chain(
        optax.scale_by_adam(b1=b1, b2=b2, eps=eps),
        optax.add_decayed_weights(weight_decay),
    )


def sgd_nesterov(weight_decay: float, momentum: float = 0.9) -> optax.GradientTransformation:
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.trace(decay=momentum, nesterov=True),
    )


def apply_updates(params, updates, lr, lr_factors=None):
    """params - lr * factor * update, with an optional per-leaf factor tree."""
    if lr_factors is None:
        return jax.tree_util.tree_map(
            lambda p, u: p - lr * u.astype(p.dtype), params, updates)
    return jax.tree_util.tree_map(
        lambda p, u, f: p - lr * f * u.astype(p.dtype), params, updates, lr_factors)


def lr_factor_tree(params, factor_fn: Callable[[tuple], float]):
    """Build a per-leaf lr-factor tree from a path->factor function."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    factors = [jnp.float32(factor_fn(tuple(str(k) for k in path)))
               for path, _ in flat]
    return jax.tree_util.tree_unflatten(treedef, factors)
