"""Label extraction from (original, annotated) frame pairs — on device.

Rebuilds the reference binarization algorithm
(rightLaneDatagen/postprocess_v2.py:29-53, ``process_classes``) as one
jittable XLA graph so a whole video's worth of frames runs as a single
batched op on TPU instead of a per-frame cv2 loop on host:

1. int16 difference ``annot - orig``
2. channel-sign decision rules (on B,G,R channels of the *BGR* frames the
   reference reads with cv2):
     - left lane  : b > 0
     - right lane : g > 0
     - obstacles  : r > 0  or  (r >= 0 and (b < 0 or g < 0))
3. per-class morphological OPEN then CLOSE with a 5×5 rect kernel
4. priority overwrite into a single uint8 mask:
   right=1, then left=2, then obstacles=3 (later classes win).

Bit-exactness vs the reference is gated in tests/test_labelgen.py against
a cv2 golden implementation.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .morphology import morph_open, morph_close


def process_classes(img_orig: jax.Array, img_annot: jax.Array,
                    channel_order: str = "bgr") -> jax.Array:
    """Extract the 4-class label mask from an (orig, annot) frame pair.

    Args:
      img_orig, img_annot: uint8 images of shape (..., H, W, 3).
      channel_order: 'bgr' (cv2-read frames, reference semantics) or 'rgb'
        (frames straight from the simulator renderer).

    Returns:
      uint8 mask (..., H, W) with {0:bg, 1:right, 2:left, 3:obstacle}.
    """
    diff = img_annot.astype(jnp.int16) - img_orig.astype(jnp.int16)
    if channel_order == "bgr":
        b, g, r = diff[..., 0], diff[..., 1], diff[..., 2]
    elif channel_order == "rgb":
        r, g, b = diff[..., 0], diff[..., 1], diff[..., 2]
    else:
        raise ValueError(f"bad channel_order {channel_order!r}")

    left = b > 0
    right = g > 0
    obstacle = (r > 0) | ((r >= 0) & ((b < 0) | (g < 0)))

    masks = [morph_close(morph_open(m, 5), 5) for m in (left, right, obstacle)]
    left, right, obstacle = masks

    out = jnp.zeros(diff.shape[:-1], jnp.uint8)
    out = jnp.where(right, jnp.uint8(1), out)
    out = jnp.where(left, jnp.uint8(2), out)
    out = jnp.where(obstacle, jnp.uint8(3), out)
    return out


process_classes_batch = jax.jit(process_classes, static_argnames=("channel_order",))
