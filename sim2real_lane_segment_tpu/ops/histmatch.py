"""Histogram matching (HM domain adaptation) as a batched on-device op.

The reference matched every source image against a random real reference
image with skimage ``match_histograms`` on a host thread pool
(rightLaneNetwork/dataManagement/hist_match_datasets.py:24-34).  skimage's
algorithm per channel: map each source value to the template value whose
CDF quantile linearly interpolates the source value's quantile.

For uint8 images the value space is the 256 bins themselves, so the exact
skimage mapping is a 256-entry LUT built from two bincounts — a tiny,
TPU-friendly computation.  Absent template values are handled by
duplicating the previous present (quantile, value) pair, which leaves the
piecewise-linear interpolant identical to skimage's present-values-only
``np.interp``.

Precision: the LUT interpolation runs in float32 (TPUs have no float64);
where an interpolated value lands within float32 error of a .5 rounding
boundary the output can differ from skimage's float64 result by ±1
intensity level (<1% of pixels in practice — gated in
tests/test_histmatch.py).  HM is an offline augmentation against a
*randomly chosen* reference image, so this is immaterial to training.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _histogram_256(flat: jax.Array) -> jax.Array:
    """256-bin histogram via compare-and-reduce (TPU scatter-adds —
    jnp.bincount — measured ~26 ms per 480x640 channel; this form is pure
    vectorized compares summing on the VPU)."""
    values = jnp.arange(256, dtype=jnp.int32)[:, None]
    return jnp.sum((flat[None, :] == values).astype(jnp.int32), axis=1)


def _match_channel(src: jax.Array, tmpl: jax.Array) -> jax.Array:
    """Match one uint8 channel (any shape) against a template channel."""
    src_flat = src.reshape(-1).astype(jnp.int32)
    tmpl_flat = tmpl.reshape(-1).astype(jnp.int32)

    src_counts = _histogram_256(src_flat)
    tmpl_counts = _histogram_256(tmpl_flat)
    src_q = jnp.cumsum(src_counts) / src_flat.size
    tmpl_q = jnp.cumsum(tmpl_counts) / tmpl_flat.size

    # For each value t, the index of the last *present* template value <= t
    # (prefix max of present indices); leading absents fall back to the
    # first present pair (interp clamps at the edges anyway).
    present = tmpl_counts > 0
    idx = jnp.where(present, jnp.arange(256), -1)
    idx = jax.lax.associative_scan(jnp.maximum, idx)
    first_present = jnp.argmax(present)
    idx = jnp.where(idx < 0, first_present, idx)

    xp = tmpl_q[idx]
    fp = idx.astype(jnp.float32)

    lut = jnp.interp(src_q, xp, fp)
    # skimage pipeline rounds via img_as_ubyte (rint) on the float output.
    lut = jnp.clip(jnp.rint(lut), 0, 255).astype(jnp.int32)
    # apply the LUT gather-free: masked sum over the 256 values
    values = jnp.arange(256, dtype=jnp.int32)[:, None]
    eq = (src_flat[None, :] == values)
    out = jnp.sum(jnp.where(eq, lut[:, None], 0), axis=0).astype(jnp.uint8)
    return out.reshape(src.shape)


def match_histograms(source: jax.Array, reference: jax.Array) -> jax.Array:
    """skimage.exposure.match_histograms(multichannel=True) for uint8 images.

    Args:
      source, reference: (H, W, C) uint8 (sizes may differ).
    """
    chans = [
        _match_channel(source[..., c], reference[..., c])
        for c in range(source.shape[-1])
    ]
    return jnp.stack(chans, axis=-1)


@jax.jit
def match_histograms_batch(sources: jax.Array, references: jax.Array) -> jax.Array:
    """vmapped histogram matching: (N,H,W,C) sources vs (N,h,w,C) references."""
    return jax.vmap(match_histograms)(sources, references)
