"""Segment-wise FC-DenseNet inference — conv(concat) == sum of per-
segment convs.

The dense-concat topology (reference tiramisu.py:89-106) makes the
standard forward re-materialize a growing concatenated tensor before
every DenseLayer: layer i writes + reads (c0 + i*growth) channels of
activations purely to feed a conv.  On TPU at 160x120 that HBM traffic,
not MXU FLOPs, bounds the model (~1.5k fps measured round 1).

But every op between two concats distributes over the channel
partition:

  BN(concat(a, b))      = concat(BN_a(a), BN_b(b))      (per-channel affine)
  relu(concat(a, b))    = concat(relu(a), relu(b))
  conv(concat(a, b), W) = conv(a, W[:, :, :Ca]) + conv(b, W[:, :, Ca:])

so a DenseBlock can keep its features as a LIST of segments (the block
input + each layer's g-channel output) and every consumer convolves the
segments it needs directly — no concatenated tensor is ever built.  The
same identity covers TransitionDown's 1x1 conv, TransitionUp's
transposed conv, the final L2 norm (sum of per-segment squares) and the
1x1 classifier (per-pixel linear, commutes with the scalar norm).

This is a pure function over the ordinary flax ``variables`` — same
params, same outputs (parity-gated in tests/test_tiramisu_fast.py),
inference only (BN running stats, no dropout).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

DN = ("NHWC", "HWIO", "NHWC")
EPS = 1e-5


def _offsets(segs):
    offs, lo = [], 0
    for s in segs:
        offs.append((lo, lo + s.shape[-1]))
        lo += s.shape[-1]
    return offs


def _bn_relu_seg(seg, p, s, lo, hi, dtype):
    """Per-segment slice of a BatchNorm over the virtual concat + relu."""
    scale = (p["scale"][lo:hi] *
             jax.lax.rsqrt(s["var"][lo:hi] + EPS)).astype(jnp.float32)
    shift = p["bias"][lo:hi] - s["mean"][lo:hi] * scale
    y = seg.astype(jnp.float32) * scale + shift
    return jnp.maximum(y, 0.0).astype(dtype)


def _conv_sum(segs, offs, kernel, bias, *, bn_p=None, bn_s=None,
              padding=((0, 0), (0, 0)), dtype=jnp.bfloat16):
    """sum_i conv(bn_relu(seg_i), kernel[:, :, lo_i:hi_i]) + bias."""
    out = None
    for seg, (lo, hi) in zip(segs, offs):
        z = seg.astype(dtype) if bn_p is None else \
            _bn_relu_seg(seg, bn_p, bn_s, lo, hi, dtype)
        y = jax.lax.conv_general_dilated(
            z, kernel[:, :, lo:hi, :].astype(dtype), (1, 1), padding,
            dimension_numbers=DN)
        out = y if out is None else out + y
    return out + bias.astype(dtype)


def _conv_transpose_sum(segs, offs, kernel, bias, dtype):
    out = None
    for seg, (lo, hi) in zip(segs, offs):
        y = jax.lax.conv_transpose(
            seg.astype(dtype), kernel[:, :, lo:hi, :].astype(dtype),
            (2, 2), "VALID", dimension_numbers=DN)
        out = y if out is None else out + y
    return out + bias.astype(dtype)


def _dense_block(segs, params, stats, n_layers, dtype):
    """Run a DenseBlock over segments; returns (all_segments, new_only)."""
    cur = list(segs)
    new = []
    for j in range(n_layers):
        lp, ls = params[f"DenseLayer_{j}"], stats[f"DenseLayer_{j}"]
        out = _conv_sum(cur, _offsets(cur), lp["Conv_0"]["kernel"],
                        lp["Conv_0"]["bias"], bn_p=lp["BatchNorm_0"],
                        bn_s=ls["BatchNorm_0"],
                        padding=((1, 1), (1, 1)), dtype=dtype)
        cur.append(out)
        new.append(out)
    return cur, new


def fast_apply(model, variables, x, *, use_softmax: bool = True):
    """Inference-mode forward of an ``FCDenseNet`` without concats.

    model: the FCDenseNet module (config source); variables: its ordinary
    {'params', 'batch_stats'}; x: preprocessed float NHWC input.
    Matches ``model.apply(variables, x, train=False, use_softmax=...)``.
    """
    dtype = model.policy.compute_dtype
    fe_p = variables["params"]["featureExtractor"]
    fe_s = variables["batch_stats"]["featureExtractor"]

    y = jax.lax.conv_general_dilated(
        x.astype(dtype), fe_p["firstconv"]["kernel"].astype(dtype), (1, 1),
        ((1, 1), (1, 1)), dimension_numbers=DN)
    segs = [y + fe_p["firstconv"]["bias"].astype(dtype)]

    skips = []
    for i, n in enumerate(model.down_blocks):
        segs, _ = _dense_block(segs, fe_p[f"denseDown{i}"],
                               fe_s[f"denseDown{i}"], n, dtype)
        skips.append(segs)
        tp, tstat = fe_p[f"transDown{i}"], fe_s[f"transDown{i}"]
        td = _conv_sum(segs, _offsets(segs), tp["Conv_0"]["kernel"],
                       tp["Conv_0"]["bias"], bn_p=tp["BatchNorm_0"],
                       bn_s=tstat["BatchNorm_0"], dtype=dtype)
        td = jax.lax.reduce_window(
            td, jnp.array(-jnp.inf, td.dtype), jax.lax.max,
            (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
        segs = [td]

    _, segs = _dense_block(segs, fe_p["bottleneck"], fe_s["bottleneck"],
                           model.bottleneck_layers, dtype)

    for i, n in enumerate(model.up_blocks):
        skip = skips.pop()
        tp = fe_p[f"transUp{i}"]["ConvTranspose_0"]
        up = _conv_transpose_sum(segs, _offsets(segs), tp["kernel"],
                                 tp["bias"], dtype)
        # center-crop to the skip's spatial size (tiramisu.center_crop)
        h, w = skip[0].shape[1], skip[0].shape[2]
        y0 = (up.shape[1] - h) // 2
        x0 = (up.shape[2] - w) // 2
        up = up[:, y0:y0 + h, x0:x0 + w, :]
        segs = [up] + list(skip)
        last = i == len(model.up_blocks) - 1
        all_segs, new_segs = _dense_block(segs, fe_p[f"denseUp{i}"],
                                          fe_s[f"denseUp{i}"], n, dtype)
        segs = all_segs if last else new_segs

    # L2 normalization: ||concat||^2 == sum of per-segment squares
    norm2 = None
    for seg in segs:
        sq = jnp.sum(seg.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
        norm2 = sq if norm2 is None else norm2 + sq
    norm = jnp.maximum(jnp.sqrt(norm2), 1e-12)

    cl_p = variables["params"]["classifier"]["finalConv"]
    if model.kernel_size == 1:
        # 1x1 conv is per-pixel linear: conv(x / n) == conv(x) / n, so the
        # normalized concat never needs materializing
        logits = _conv_sum(segs, _offsets(segs), cl_p["kernel"],
                           jnp.zeros_like(cl_p["bias"]), dtype=dtype)
        logits = logits.astype(jnp.float32) / norm + cl_p["bias"]
    else:
        feats = (jnp.concatenate([s.astype(jnp.float32) for s in segs], -1)
                 / norm).astype(dtype)
        pad = model.kernel_size // 2
        logits = jax.lax.conv_general_dilated(
            feats, cl_p["kernel"].astype(dtype), (1, 1),
            ((pad, pad), (pad, pad)), dimension_numbers=DN)
        logits = logits.astype(jnp.float32) + cl_p["bias"]

    logits = logits / 0.05  # FCDenseNetClassifier temperature (T=0.05)
    if use_softmax:
        logits = jax.nn.softmax(logits, axis=-1)
    return logits
