"""On-device training augmentation pipeline (the reference's MyTransform).

The reference ran albumentations on 8 CPU dataloader workers per step
(rightLaneNetwork/dataManagement/myTransforms.py:6-31):

  train: HueSaturationValue -> RandomSizedCrop(min_max_height=(h/2, 4h),
         w2h locked) -> OneOf(MotionBlur, GaussNoise) -> [ToGray] ->
         Normalize -> tensor
  eval : Resize(h, w) -> [ToGray] -> Normalize -> tensor

Here the whole pipeline is a single jitted, vmapped XLA graph that runs on
TPU right before the train step (and fuses with it), keyed by a JAX PRNG
key — deterministic, replayable, and shard-parallel by construction, which
is what fixes the reference's "custom samplers break DDP" problem
(reference README.md:275-277) on the augmentation side.

Static shapes: the random-sized crop is expressed as a crop-box +
``jax.image.scale_and_translate`` to the fixed (height, width) output, so
the traced program has one shape regardless of the sampled crop.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .colorspace import shift_hsv
from .resize import IMAGENET_MEAN, IMAGENET_STD, normalize, \
    normalize_flat, resize_bilinear, resize_nearest_label, to_gray


class AugmentConfig(NamedTuple):
    height: int = 120
    width: int = 160
    gray: bool = False
    # albumentations defaults (myTransforms.py:8-13)
    hue_limit: float = 20.0
    sat_limit: float = 30.0
    val_limit: float = 20.0
    min_crop_height: int = 60      # height // 2
    max_crop_height: int = 480     # height * 4
    noise_var_min: float = 10.0
    noise_var_max: float = 50.0
    channel_order: str = "bgr"


# ---------------------------------------------------------------------------
# motion-blur kernel bank
# ---------------------------------------------------------------------------

def _line_kernel(size: int, angle_idx: int, n_angles: int = 8) -> np.ndarray:
    """A normalized line kernel through the center, padded to 7x7."""
    k = np.zeros((size, size), np.float32)
    c = (size - 1) / 2
    theta = np.pi * angle_idx / n_angles
    dx, dy = np.cos(theta), np.sin(theta)
    for t in np.linspace(-c, c, 4 * size):
        x = int(round(c + t * dx))
        y = int(round(c + t * dy))
        if 0 <= x < size and 0 <= y < size:
            k[y, x] = 1.0
    k /= k.sum()
    pad = (7 - size) // 2
    return np.pad(k, ((pad, pad), (pad, pad)))


_MB_SIZES = (3, 5, 7)
_MB_ANGLES = 8
MOTION_BLUR_BANK = jnp.asarray(np.stack([
    _line_kernel(s, a) for s in _MB_SIZES for a in range(_MB_ANGLES)
]))  # (24, 7, 7)


def motion_blur(img: jax.Array, kernel: jax.Array) -> jax.Array:
    """Depthwise 7x7 blur of one (H, W, C) image with the given kernel."""
    c = img.shape[-1]
    lhs = img[None].astype(jnp.float32)                       # (1, H, W, C)
    rhs = jnp.broadcast_to(kernel[:, :, None, None], (7, 7, 1, c))
    out = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
    return out[0]


# ---------------------------------------------------------------------------
# per-sample augmentation
# ---------------------------------------------------------------------------

def _random_sized_crop(key, img, label, cfg: AugmentConfig):
    """RandomSizedCrop: sample crop box, resample to (height, width).

    albumentations semantics (myTransforms.py:10-11): crop_height ~
    uniform-int[min, max], crop_width = crop_height * w2h (w2h = width /
    height so the aspect is locked), position uniform.  Crops larger than
    the source are clamped to the source (the reference never hits this
    because sources are 640x480; documented deviation).
    """
    kh, kpos_h, kpos_w = jax.random.split(key, 3)
    src_h, src_w = img.shape[0], img.shape[1]
    w2h = cfg.width / cfg.height

    crop_h = jax.random.randint(kh, (), cfg.min_crop_height,
                                cfg.max_crop_height + 1).astype(jnp.float32)
    crop_h = jnp.minimum(crop_h, float(src_h))
    crop_w = jnp.minimum(jnp.floor(crop_h * w2h), float(src_w))

    h_start = jax.random.uniform(kpos_h)
    w_start = jax.random.uniform(kpos_w)
    y1 = jnp.floor((src_h - crop_h + 1.0) * h_start)
    x1 = jnp.floor((src_w - crop_w + 1.0) * w_start)

    scale_y = cfg.height / crop_h
    scale_x = cfg.width / crop_w
    scale = jnp.stack([scale_y, scale_x])
    translation = jnp.stack([-y1 * scale_y, -x1 * scale_x])

    img = jax.image.scale_and_translate(
        img.astype(jnp.float32), (cfg.height, cfg.width, img.shape[2]),
        (0, 1), scale, translation, method="linear", antialias=False)
    if label is not None:
        # nearest resample of the same crop box (scale_and_translate has no
        # nearest mode).  A per-pixel 2D index gather here measured ~16 ms
        # per 64-batch on a v5e — gathers are TPU-hostile — while the same
        # selection expressed as two one-hot matmuls (row pick then column
        # pick, one 1.0 per output row so the products are exact) runs on
        # the MXU in ~0.2 ms at bit-identical outputs (gated in
        # tests/test_transforms.py::test_crop_label_matmul_matches_gather).
        oy = jnp.arange(cfg.height, dtype=jnp.float32)
        ox = jnp.arange(cfg.width, dtype=jnp.float32)
        sy = jnp.clip(jnp.round(y1 + (oy + 0.5) / scale_y - 0.5).astype(jnp.int32),
                      0, src_h - 1)
        sx = jnp.clip(jnp.round(x1 + (ox + 0.5) / scale_x - 0.5).astype(jnp.int32),
                      0, src_w - 1)
        pick_y = (sy[:, None] == jnp.arange(src_h)[None, :]).astype(jnp.float32)
        pick_x = (sx[:, None] == jnp.arange(src_w)[None, :]).astype(jnp.float32)
        rows = jnp.einsum("hj,jw->hw", pick_y, label.astype(jnp.float32),
                          precision=jax.lax.Precision.HIGHEST)
        label = jnp.einsum("wk,hk->hw", pick_x, rows,
                           precision=jax.lax.Precision.HIGHEST).astype(jnp.int32)
    return img, label


def _augment_one(key, img, label, cfg: AugmentConfig):
    k_hsv, k_crop, k_which, k_mb, k_noise = jax.random.split(key, 5)

    # 1. HSV jitter
    h_sh, s_sh, v_sh = jax.random.uniform(k_hsv, (3,), minval=-1.0, maxval=1.0)
    img = shift_hsv(img, h_sh * cfg.hue_limit, s_sh * cfg.sat_limit,
                    v_sh * cfg.val_limit, cfg.channel_order)

    # 2. random-sized crop to (height, width)
    img, label = _random_sized_crop(k_crop, img, label, cfg)

    # 3. OneOf(MotionBlur, GaussNoise), 50/50
    k_idx, k_sig, k_g = jax.random.split(k_noise, 3)
    mb_kernel = MOTION_BLUR_BANK[jax.random.randint(k_mb, (), 0, MOTION_BLUR_BANK.shape[0])]
    blurred = motion_blur(img, mb_kernel)
    sigma = jnp.sqrt(jax.random.uniform(
        k_sig, (), minval=cfg.noise_var_min, maxval=cfg.noise_var_max))
    noisy = img + sigma * jax.random.normal(k_g, img.shape)
    use_blur = jax.random.bernoulli(k_which, 0.5)
    img = jnp.clip(jnp.where(use_blur, blurred, noisy), 0.0, 255.0)

    # 4. optional gray, 5. normalize
    if cfg.gray:
        img = to_gray(img, cfg.channel_order)
    img = normalize(img)
    return img, label


@functools.partial(jax.jit, static_argnames=("cfg", "with_labels"))
def augment_batch(key: jax.Array, images: jax.Array, labels: jax.Array | None,
                  cfg: AugmentConfig = AugmentConfig(), with_labels: bool = True):
    """Train-time augmentation of a uint8 batch.

    Args:
      key: PRNG key for the whole batch (split per sample).
      images: (N, H, W, 3) uint8.
      labels: (N, H, W) uint8/int or None.
    Returns:
      (x, y): float32 normalized (N, height, width, 3) and int32 labels
      (or None).
    """
    keys = jax.random.split(key, images.shape[0])
    if with_labels and labels is not None:
        return jax.vmap(lambda k, i, l: _augment_one(k, i, l, cfg))(keys, images, labels)
    x, _ = jax.vmap(lambda k, i: _augment_one(k, i, None, cfg))(keys, images)
    return x, None


@functools.partial(jax.jit, static_argnames=("cfg", "with_labels"))
def eval_batch(images: jax.Array, labels: jax.Array | None,
               cfg: AugmentConfig = AugmentConfig(), with_labels: bool = True):
    """Eval-time transform: Resize -> [ToGray] -> Normalize (+ label resize)."""
    if images.shape[-3:-1] == (cfg.height, cfg.width):
        x = images.astype(jnp.float32)  # already target size: skip resample
    else:
        x = resize_bilinear(images, cfg.height, cfg.width)
    if cfg.gray:
        x = to_gray(x, cfg.channel_order)
    x = normalize_flat(x)
    y = None
    if with_labels and labels is not None:
        y = labels
        if y.shape[-2:] != (cfg.height, cfg.width):
            y = resize_nearest_label(y, cfg.height, cfg.width)
        y = y.astype(jnp.int32)
    return x, y
