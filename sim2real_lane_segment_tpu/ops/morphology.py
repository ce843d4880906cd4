"""Binary morphology as XLA ``reduce_window`` ops.

TPU-native replacement for the cv2 morphology the reference's label
extraction used (reference rightLaneDatagen/postprocess_v2.py:40-44:
``cv2.morphologyEx(x, MORPH_OPEN/MORPH_CLOSE, 5x5 rect kernel)`` on 0/1
uint8 masks).  These must be *bit-identical* to cv2:

- erosion  = min over the window; cv2 pads the border with the type max
  (``morphologyDefaultBorderValue``), i.e. out-of-image pixels never win the
  min → ``reduce_window`` with init value 255 / True.
- dilation = max over the window; cv2 pads with the type min → init 0/False.

On uint8 0/1 masks this padding rule is exactly XLA's reduce-window identity
padding, so a single fused reduce_window per op reproduces cv2 exactly
(verified in tests/test_morphology.py against cv2 golden outputs).

Ops work on boolean masks of shape (..., H, W); the window runs over the
last two axes.  min/max over bool lowers to and/or reductions on the VPU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _window(x: jax.Array, size: int, reducer, init):
    nd = x.ndim
    window = (1,) * (nd - 2) + (size, size)
    strides = (1,) * nd
    pad = size // 2
    padding = ((0, 0),) * (nd - 2) + ((pad, pad), (pad, pad))
    return lax.reduce_window(x, init, reducer, window, strides, padding)


def erode(mask: jax.Array, size: int = 5) -> jax.Array:
    """Binary erosion with a size×size rect structuring element."""
    m = mask.astype(jnp.bool_)
    return _window(m, size, lax.bitwise_and, jnp.array(True))


def dilate(mask: jax.Array, size: int = 5) -> jax.Array:
    """Binary dilation with a size×size rect structuring element."""
    m = mask.astype(jnp.bool_)
    return _window(m, size, lax.bitwise_or, jnp.array(False))


def morph_open(mask: jax.Array, size: int = 5) -> jax.Array:
    return dilate(erode(mask, size), size)


def morph_close(mask: jax.Array, size: int = 5) -> jax.Array:
    return erode(dilate(mask, size), size)
