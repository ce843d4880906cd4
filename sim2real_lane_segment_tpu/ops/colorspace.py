"""Color-space ops for on-device augmentation (HSV jitter).

The reference's HueSaturationValue ran on host via albumentations/cv2 in
uint8 HSV space (hue channel 0..179 wrapping, sat/val 0..255 clipping).
Here the whole jitter runs on device in float with the same value ranges,
fused into the augmentation graph.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def rgb_to_hsv_cv(img: jax.Array) -> jax.Array:
    """(..., 3) float image in [0,255] -> HSV with H in [0,180), S,V in [0,255].

    cv2 ranges (uint8 convention) but computed in float.  Works for BGR
    input too if the caller flips channels; this function expects R,G,B
    positional order.
    """
    img = img.astype(jnp.float32)
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    v = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    c = v - mn
    safe_c = jnp.where(c > 0, c, 1.0)
    # hue in degrees [0, 360)
    h = jnp.where(v == r, 60.0 * (g - b) / safe_c,
        jnp.where(v == g, 120.0 + 60.0 * (b - r) / safe_c,
                  240.0 + 60.0 * (r - g) / safe_c))
    h = jnp.where(c > 0, jnp.mod(h, 360.0), 0.0)
    s = jnp.where(v > 0, c / jnp.where(v > 0, v, 1.0) * 255.0, 0.0)
    return jnp.stack([h / 2.0, s, v], axis=-1)  # cv2: H halved to fit u8


def hsv_to_rgb_cv(hsv: jax.Array) -> jax.Array:
    """Inverse of rgb_to_hsv_cv; output float in [0,255], R,G,B order."""
    h = hsv[..., 0] * 2.0  # degrees
    s = hsv[..., 1] / 255.0
    v = hsv[..., 2]
    c = v * s
    hp = h / 60.0
    x = c * (1.0 - jnp.abs(jnp.mod(hp, 2.0) - 1.0))
    z = jnp.zeros_like(c)
    i = jnp.floor(hp).astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [c, x, z, z, x, c])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [x, c, c, x, z, z])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [z, z, x, c, c, x])
    m = v - c
    return jnp.stack([r + m, g + m, b + m], axis=-1)


def shift_hsv(img: jax.Array, hue_shift: jax.Array, sat_shift: jax.Array,
              val_shift: jax.Array, channel_order: str = "bgr") -> jax.Array:
    """HueSaturationValue jitter in cv2 uint8 value ranges.

    hue_shift in cv2 hue units (0..180 wraps), sat/val shifts in [0,255]
    units, matching albumentations defaults hue±20, sat±30, val±20
    (reference myTransforms.py:9).
    """
    x = img.astype(jnp.float32)
    if channel_order == "bgr":
        x = x[..., ::-1]
    hsv = rgb_to_hsv_cv(x)
    h = jnp.mod(hsv[..., 0] + hue_shift, 180.0)
    s = jnp.clip(hsv[..., 1] + sat_shift, 0.0, 255.0)
    v = jnp.clip(hsv[..., 2] + val_shift, 0.0, 255.0)
    out = hsv_to_rgb_cv(jnp.stack([h, s, v], axis=-1))
    if channel_order == "bgr":
        out = out[..., ::-1]
    return jnp.clip(out, 0.0, 255.0)
