"""Image/label resize ops with cv2-matching semantics, batched on device.

Replaces the reference's host-side cv2 resizes:
- inputs: cv2.resize INTER_LINEAR (half-pixel centers, NO antialiasing —
  reference myTransforms.py:16 Resize, preprocessDatabase.py:218).
- labels: cv2.resize INTER_NEAREST, whose source index is
  ``floor(dst * src/dst)`` (truncation, no half-pixel offset —
  preprocessDatabase.py:221).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def resize_bilinear(img: jax.Array, height: int, width: int) -> jax.Array:
    """cv2 INTER_LINEAR equivalent for (..., H, W, C) images (float output)."""
    shape = (*img.shape[:-3], height, width, img.shape[-1])
    return jax.image.resize(img.astype(jnp.float32), shape, method="linear",
                            antialias=False)


def resize_nearest_label(label: jax.Array, height: int, width: int) -> jax.Array:
    """cv2 INTER_NEAREST equivalent for (..., H, W) integer label maps."""
    src_h, src_w = label.shape[-2], label.shape[-1]
    ys = jnp.clip((jnp.arange(height) * (src_h / height)).astype(jnp.int32), 0, src_h - 1)
    xs = jnp.clip((jnp.arange(width) * (src_w / width)).astype(jnp.int32), 0, src_w - 1)
    return label[..., ys[:, None], xs[None, :]]


# ImageNet normalization (albumentations Normalize defaults,
# reference myTransforms.py:19).  NOTE the reference feeds cv2-read BGR
# images through these RGB-ordered constants — a self-consistent quirk we
# preserve by also flowing BGR arrays through the same positional constants.
IMAGENET_MEAN = jnp.array([0.485, 0.456, 0.406], jnp.float32)
IMAGENET_STD = jnp.array([0.229, 0.224, 0.225], jnp.float32)


def normalize(img: jax.Array, mean=IMAGENET_MEAN, std=IMAGENET_STD,
              max_pixel: float = 255.0) -> jax.Array:
    return (img.astype(jnp.float32) / max_pixel - mean) / std


def normalize_flat(img: jax.Array, mean=IMAGENET_MEAN, std=IMAGENET_STD,
                   max_pixel: float = 255.0) -> jax.Array:
    """``normalize`` computed on a flattened (..., H*W*C) view.

    Identical arithmetic (divide, subtract, divide — bit-exact vs
    :func:`normalize`), but the elementwise ops run with the pixel axis
    on vector lanes instead of the C=3 channel axis: NHWC tensors put
    C minor, so a straight ``(x/255 - mean)/std`` uses 3 of 128 lanes
    per VPU op (~24% of LaneNetLite serving time, measured).  The
    per-channel constants are tiled to a (H*W*C,) vector instead.
    """
    *lead, h, w, c = img.shape
    mean_v = jnp.tile(jnp.asarray(mean, jnp.float32), h * w)
    std_v = jnp.tile(jnp.asarray(std, jnp.float32), h * w)
    x = img.reshape(*lead, h * w * c).astype(jnp.float32)
    x = (x / max_pixel - mean_v) / std_v
    return x.reshape(*lead, h, w, c)


def denormalize(x: jax.Array, mean=IMAGENET_MEAN, std=IMAGENET_STD,
                max_pixel: float = 255.0) -> jax.Array:
    return (x * std + mean) * max_pixel


def to_gray(img: jax.Array, channel_order: str = "bgr") -> jax.Array:
    """Luma conversion replicated to 3 channels (albumentations ToGray)."""
    w = jnp.array([0.114, 0.587, 0.299] if channel_order == "bgr"
                  else [0.299, 0.587, 0.114], jnp.float32)
    gray = jnp.sum(img.astype(jnp.float32) * w, axis=-1, keepdims=True)
    return jnp.broadcast_to(gray, img.shape[:-1] + (3,))
