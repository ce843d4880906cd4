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
params, same outputs (parity-gated in tests/test_tiramisu_fast.py).

``fast_apply`` is the inference form (BN running stats, no dropout).
``fast_apply_train`` is the TRAIN-mode form: the same segment algebra
extends because a segment's batch statistics never change after it is
produced — BatchNorm over the virtual concat normalizes channel c with
the batch mean/var of the segment that owns c, so each segment's
(mean, var) is computed ONCE at production and reused by every
consuming layer (each consumer still applies its own scale/bias and
updates its own running stats, exactly like the flax modules).
Dropout2d is likewise applied once, at segment production (reference
layers.py puts it inside DenseLayer before the concat).  The per-site
dropout keys use this module's own fold-in chain, NOT flax's
path-derived streams — train-mode outputs are an equally-distributed
but different random realization than ``model.apply``; exact parity is
gated with ``dropout_rate=0`` models (tests/test_tiramisu_fast.py).
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


def _bn_relu_seg_batch(seg, p, lo, hi, mu, var, dtype):
    """Train-mode BN slice: normalize with the segment's batch stats."""
    scale = (p["scale"][lo:hi] * jax.lax.rsqrt(var + EPS)).astype(jnp.float32)
    shift = p["bias"][lo:hi] - mu * scale
    y = seg.astype(jnp.float32) * scale + shift
    return jnp.maximum(y, 0.0).astype(dtype)


def _conv_sum(segs, offs, kernel, bias, *, bn_p=None, bn_s=None,
              seg_stats=None, padding=((0, 0), (0, 0)), dtype=jnp.bfloat16):
    """sum_i conv(bn_relu(seg_i), kernel[:, :, lo_i:hi_i]) + bias.

    ``bn_s`` (running stats) selects the inference BN; ``seg_stats`` (a
    list of per-segment (mean, var)) selects train-mode batch-stat BN."""
    out = None
    for i, (seg, (lo, hi)) in enumerate(zip(segs, offs)):
        if seg_stats is not None:
            z = _bn_relu_seg_batch(seg, bn_p, lo, hi,
                                   seg_stats[i][0], seg_stats[i][1], dtype)
        elif bn_p is not None:
            z = _bn_relu_seg(seg, bn_p, bn_s, lo, hi, dtype)
        else:
            z = seg.astype(dtype)
        y = jax.lax.conv_general_dilated(
            z, kernel[:, :, lo:hi, :].astype(dtype), (1, 1), padding,
            dimension_numbers=DN)
        out = y if out is None else out + y
    return out + bias.astype(dtype)


def _conv_transpose_sum(segs, offs, kernel, bias, dtype):
    """ONE full-K transposed conv over the concatenated segments.  The
    per-segment sum-of-slices form is algebraically identical but runs
    the MXU at K=growth_rate/128 efficiency and its VJP triples the
    tiny-conv count (measured 22% of the b128 train step — see
    tiramisu_train_pallas._transition_up_cm)."""
    x = jnp.concatenate([s.astype(dtype) for s in segs], axis=-1)
    out = jax.lax.conv_transpose(
        x, kernel.astype(dtype), (2, 2), "VALID", dimension_numbers=DN)
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


def _l2_classifier_head(model, variables, segs, dtype, use_softmax):
    """Shared tail: per-segment L2 norm + 1x1 classifier + T-softmax."""
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

    return _l2_classifier_head(model, variables, segs, dtype, use_softmax)


# ---------------------------------------------------------------------------
# train mode
# ---------------------------------------------------------------------------


def _seg_stats(seg):
    """Batch (mean, var) per channel over (N, H, W) — flax's biased-var
    formula (mean of squares minus squared mean, clamped at 0)."""
    x = seg.astype(jnp.float32)
    mu = jnp.mean(x, axis=(0, 1, 2))
    var = jnp.maximum(jnp.mean(x * x, axis=(0, 1, 2)) - mu * mu, 0.0)
    return mu, var


def _dropout2d(key, x, rate):
    """Channelwise dropout (nn.Dropout broadcast_dims=(1, 2) semantics)."""
    if rate == 0.0:
        return x
    keep = jax.random.bernoulli(key, 1.0 - rate,
                                (x.shape[0], 1, 1, x.shape[-1]))
    return jnp.where(keep, x / (1.0 - rate), jnp.zeros_like(x))


def _bn_update(old, stats):
    """torch-momentum running-stat update (flax momentum 0.9): the
    consumer's running stats move toward the assembled batch stats."""
    mu = jnp.concatenate([s[0] for s in stats])
    var = jnp.concatenate([s[1] for s in stats])
    return {"mean": 0.9 * old["mean"] + 0.1 * mu,
            "var": 0.9 * old["var"] + 0.1 * var}


def _dense_block_train(segs, stats, params, old_stats, n_layers, rate,
                       key, site, dtype):
    """Train-mode DenseBlock over segments.

    Returns (all_segs, all_stats, new_segs, new_stats, bn_updates, site'):
    per layer, BN uses the per-segment batch stats, dropout is applied to
    the produced segment, and the layer's running-stat update is recorded.
    ``site`` numbers the dropout sites for the fold-in key chain."""
    cur, cur_stats = list(segs), list(stats)
    new, new_stats = [], []
    updates = {}
    for j in range(n_layers):
        lp = params[f"DenseLayer_{j}"]
        out = _conv_sum(cur, _offsets(cur), lp["Conv_0"]["kernel"],
                        lp["Conv_0"]["bias"], bn_p=lp["BatchNorm_0"],
                        seg_stats=cur_stats,
                        padding=((1, 1), (1, 1)), dtype=dtype)
        out = _dropout2d(jax.random.fold_in(key, site), out, rate)
        site += 1
        st = _seg_stats(out)
        updates[f"DenseLayer_{j}"] = {"BatchNorm_0": _bn_update(
            old_stats[f"DenseLayer_{j}"]["BatchNorm_0"], cur_stats)}
        cur.append(out)
        cur_stats.append(st)
        new.append(out)
        new_stats.append(st)
    return cur, cur_stats, new, new_stats, updates, site


def fast_apply_train(model, variables, x, key, *, use_softmax: bool = True,
                     reverse_features: bool = False):
    """Train-mode forward of an ``FCDenseNet`` without concats.

    Matches ``model.apply(variables, x, train=True, rngs={'dropout': k},
    mutable=['batch_stats'])`` in BN semantics (batch-stat normalization +
    running-stat updates; exact parity gated with dropout_rate=0 models)
    and in dropout DISTRIBUTION (channelwise rate, 1/(1-p) scaling) — the
    masks come from this function's own key chain, so they are a
    different random realization than flax's path-derived streams.

    ``reverse_features`` inserts MME's gradient reversal between the
    feature extractor and the classifier (the flax path applies
    grad_reverse to the L2-normalized concat, mme.py:_forward_adversarial;
    grad_reverse is a linear identity, so applying it to every segment
    before the fused norm+classifier head flips exactly the same
    cotangents — every loss path from the segments passes through it).

    Returns (output, new_batch_stats) where new_batch_stats mirrors the
    flax mutable ['batch_stats'] tree.
    """
    dtype = model.policy.compute_dtype
    rate = model.dropout_rate
    fe_p = variables["params"]["featureExtractor"]
    fe_s = variables["batch_stats"]["featureExtractor"]
    new_fe = {}
    site = 0  # dropout-site counter for the fold-in chain

    y = jax.lax.conv_general_dilated(
        x.astype(dtype), fe_p["firstconv"]["kernel"].astype(dtype), (1, 1),
        ((1, 1), (1, 1)), dimension_numbers=DN)
    y = y + fe_p["firstconv"]["bias"].astype(dtype)
    segs, stats = [y], [_seg_stats(y)]

    skips, skip_stats = [], []
    for i, n in enumerate(model.down_blocks):
        segs, stats, _, _, upd, site = _dense_block_train(
            segs, stats, fe_p[f"denseDown{i}"], fe_s[f"denseDown{i}"],
            n, rate, key, site, dtype)
        new_fe[f"denseDown{i}"] = upd
        skips.append(segs)
        skip_stats.append(stats)
        tp = fe_p[f"transDown{i}"]
        td = _conv_sum(segs, _offsets(segs), tp["Conv_0"]["kernel"],
                       tp["Conv_0"]["bias"], bn_p=tp["BatchNorm_0"],
                       seg_stats=stats, dtype=dtype)
        td = _dropout2d(jax.random.fold_in(key, site), td, rate)
        site += 1
        # reshape + axis max: same forward values as reduce_window, but
        # the backward is a fused eq-mask instead of SelectAndScatter
        # (see tiramisu_train_pallas._pool2_cm for the tie analysis)
        bsz, hh, ww, cc = td.shape
        td = td[:, :(hh // 2) * 2, :(ww // 2) * 2, :].reshape(
            bsz, hh // 2, 2, ww // 2, 2, cc)
        td = jnp.max(td, axis=(2, 4))
        new_fe[f"transDown{i}"] = {"BatchNorm_0": _bn_update(
            fe_s[f"transDown{i}"]["BatchNorm_0"], stats)}
        # stats of the segment the NEXT block consumes: post-pool values
        segs, stats = [td], [_seg_stats(td)]

    _, _, segs, stats, upd, site = _dense_block_train(
        segs, stats, fe_p["bottleneck"], fe_s["bottleneck"],
        model.bottleneck_layers, rate, key, site, dtype)
    new_fe["bottleneck"] = upd

    for i, n in enumerate(model.up_blocks):
        skip, skst = skips.pop(), skip_stats.pop()
        tp = fe_p[f"transUp{i}"]["ConvTranspose_0"]
        up = _conv_transpose_sum(segs, _offsets(segs), tp["kernel"],
                                 tp["bias"], dtype)
        h, w = skip[0].shape[1], skip[0].shape[2]
        y0 = (up.shape[1] - h) // 2
        x0 = (up.shape[2] - w) // 2
        up = up[:, y0:y0 + h, x0:x0 + w, :]
        segs = [up] + list(skip)
        stats = [_seg_stats(up)] + list(skst)
        last = i == len(model.up_blocks) - 1
        all_segs, all_stats, new_segs, new_stats, upd, site = \
            _dense_block_train(segs, stats, fe_p[f"denseUp{i}"],
                               fe_s[f"denseUp{i}"], n, rate, key, site, dtype)
        new_fe[f"denseUp{i}"] = upd
        segs, stats = ((all_segs, all_stats) if last
                       else (new_segs, new_stats))

    if reverse_features:
        from .tiramisu import grad_reverse
        segs = [grad_reverse(s) for s in segs]
    out = _l2_classifier_head(model, variables, segs, dtype, use_softmax)
    return out, {"featureExtractor": new_fe}
