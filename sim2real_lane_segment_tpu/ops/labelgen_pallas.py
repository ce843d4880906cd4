"""Fused Pallas kernel for the full label-extraction pipeline.

The reduce_window formulation (ops/labelgen.py) materializes ~12
intermediate HBM masks per frame (3 classes x open/close x erode/dilate).
This kernel fuses the whole of ``process_classes`` — int16 diff,
channel-sign rules, 5x5 OPEN then CLOSE per class, priority overwrite —
into ONE pass per frame: the grid runs over the batch, each step loads
one frame pair into VMEM, runs every morphology stage there using
*separable* 5x1/1x5 min/max shift chains (a rect structuring element is
separable), and writes the final uint8 mask.  HBM traffic drops to the
information-theoretic minimum: 6 bytes read + 1 byte written per pixel.

VMEM budget at 480x640: 2 x 0.9 MB uint8 inputs + a handful of f32
(H, W) mask buffers ≈ 6 MB — comfortably inside the ~16 MB/core VMEM.

Bit-exactness: the shift chains use cv2's border semantics (erosion pads
with 1s, dilation with 0s — see ops/morphology.py); gated against the
golden path in tests/test_labelgen_pallas.py (interpret mode on CPU,
compiled on TPU).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pad_shift_reduce(m, axis: int, op, pad_val: float):
    """5-tap min/max along ``axis`` with constant padding.

    Mosaic has no sublane-axis concatenate and rejects big i1 vectors, so
    shifting is a circular ``pltpu.roll`` with the wrapped rows/cols
    neutralized by arithmetic (f32 iota) masks.
    """
    n = m.shape[axis]
    ids = jax.lax.broadcasted_iota(jnp.int32, m.shape, axis).astype(jnp.float32)
    out = m
    for k in (-2, -1, 1, 2):
        # pltpu.roll requires a non-negative shift; negative k rolls by n+k
        r = pltpu.roll(m, shift=(k % n), axis=axis)
        # rolled element at index i came from i-k; invalid when i-k is
        # outside [0, n). valid = (ids >= k) * (ids < n + k) as 0/1 floats.
        lo = jnp.clip(jnp.sign(ids - (k - 0.5)), 0.0, 1.0)
        hi = jnp.clip(jnp.sign((n + k - 0.5) - ids), 0.0, 1.0)
        valid = lo * hi
        r = r * valid + pad_val * (1.0 - valid)
        out = op(out, r)
    return out


def _erode(m):
    m = _pad_shift_reduce(m, 0, jnp.minimum, 1.0)
    return _pad_shift_reduce(m, 1, jnp.minimum, 1.0)


def _dilate(m):
    m = _pad_shift_reduce(m, 0, jnp.maximum, 0.0)
    return _pad_shift_reduce(m, 1, jnp.maximum, 0.0)


def _kernel(orig_ref, annot_ref, out_ref, *, channel_order: str):
    # All mask math is pure f32 arithmetic (sign/clip/min/max): Mosaic
    # rejects relayouts of large i1 vectors, so no boolean tensors appear.
    # diff of uint8 values is exactly representable in f32 ([-255, 255]).
    # (u8 -> i32 -> f32: Mosaic has no direct u8 -> f32 cast.)
    to_f32 = lambda x: x.astype(jnp.int32).astype(jnp.float32)
    diff = to_f32(annot_ref[0]) - to_f32(orig_ref[0])
    if channel_order == "bgr":
        b, g, r = diff[..., 0], diff[..., 1], diff[..., 2]
    else:
        r, g, b = diff[..., 0], diff[..., 1], diff[..., 2]

    pos = lambda x: jnp.clip(jnp.sign(x), 0.0, 1.0)          # x > 0
    neg = lambda x: jnp.clip(-jnp.sign(x), 0.0, 1.0)         # x < 0
    nonneg = lambda x: jnp.clip(jnp.sign(x) + 1.0, 0.0, 1.0)  # x >= 0

    left = pos(b)
    right = pos(g)
    # (r > 0) | ((r >= 0) & ((b < 0) | (g < 0)))
    obstacle = jnp.maximum(pos(r),
                           jnp.minimum(nonneg(r), jnp.maximum(neg(b), neg(g))))

    outs = []
    for mask in (right, left, obstacle):
        m = _dilate(_erode(mask))   # OPEN
        m = _erode(_dilate(m))      # CLOSE
        outs.append(m)
    right, left, obstacle = outs

    # priority overwrite right=1 -> left=2 -> obstacle=3, in f32
    lab = right
    lab = lab * (1.0 - left) + 2.0 * left
    lab = lab * (1.0 - obstacle) + 3.0 * obstacle
    out_ref[0] = lab


@functools.partial(jax.jit, static_argnames=("channel_order", "interpret"))
def process_classes_fused(img_orig: jax.Array, img_annot: jax.Array,
                          channel_order: str = "bgr",
                          interpret: bool = False) -> jax.Array:
    """Fused-pallas process_classes for (N, H, W, 3) uint8 batches."""
    n, h, w, _ = img_orig.shape
    kernel = functools.partial(_kernel, channel_order=channel_order)
    out = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, w, 3), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w, 3), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w), jnp.float32),
        interpret=interpret,
    )(img_orig, img_annot)
    return out.astype(jnp.uint8)
