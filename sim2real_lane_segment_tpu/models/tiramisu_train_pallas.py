"""Pallas custom-VJP FC-DenseNet TRAIN step — dense blocks without concat
(or per-pair bnrelu) materialization, in forward AND backward.

Why: the measured decomposition of the FCDenseNet67 train step (RESULTS.md)
shows it memory-bound, not MXU-bound (~6% MXU at 244 ms/64-batch).  The
XLA options both lose to the standard flax apply's 262 img/s:

- standard apply re-materializes BN(concat) per DenseLayer (reference
  rightLaneNetwork/models/FCDenseNet/layers.py:5-25) — conv operands
  cannot fuse with their producers, so every layer writes + reads its
  full (c0 + j*g)-channel input twice more than necessary;
- the segment-wise XLA form (tiramisu_fast.fast_apply_train) avoids the
  concats but pays per-segment convs with K=16 contractions — the MXU
  runs at 16/128 K-efficiency and the VJP doubles the tiny-conv count
  (measured 101 img/s, 2.6x SLOWER than standard — RESULTS.md).

This module keeps the segment ALGEBRA (a virtual concat held as a list
of channel-major [B, C_s, Ppad] tensors — see tiramisu_fast.py's header
for the identities) but executes each consumer layer as ONE Pallas
kernel with its own custom VJP:

- forward: segments DMA into a contiguous VMEM buffer (full-K GEMMs — the
  fix for fast_train's K=16 problem), the consumer's folded BN affine +
  ReLU apply as the K-chunk is fed to the MXU (kn2row: one GEMM
  Wf[9g, c_j] @ A[c_j, P] + 9 tap shift-adds, the layout proven by
  tiramisu_pallas.py), conv bias + channelwise dropout fuse into the
  epilogue.  Inter-layer activations are only ever the g-channel layer
  outputs — the minimum the train-mode BN semantics allow (each layer's
  batch stats must be global over (N, H, W) before any consumer runs,
  so per-layer HBM round-trips are irreducible; what this kernel deletes
  is the per-(layer, segment) bnrelu materializations, 2/3 of the
  traffic).
- backward: ONE rolled-cotangent matrix G9r[t] = roll(g_y * m_t, off_t)
  serves both gradient GEMMs — dA = Wf^T-contraction @ G9r (input grads)
  and dW = G9r @ A^T (weight grads, accumulated across the batch grid in
  the f32 output block).  Activations are recomputed in VMEM from the
  (already-resident) segments; the only saved residuals are tensors the
  network keeps anyway.  By default the whole block's backward runs as
  the FUSED reverse sweep (`_fused_block` below — round 5): inter-layer
  cotangent traffic is compressed to each layer's g-channel
  pre-activation gradient and the per-layer [c_j, P] input-cotangent
  materializations (plus XLA's re-reads to sum them) are eliminated;
  S2R_FUSED_BLOCK_BWD=0 restores the per-consumer custom-VJP path.
- the BatchNorm STATISTICS chain (batch mean/var, gradients through
  them, running-stat updates) lives entirely in differentiable XLA glue
  outside the kernels: the kernel's custom VJP returns cotangents for
  its folded (scale, shift) inputs, and jax autodiff routes them through
  the fold to gamma/beta and through the per-segment stats back into the
  producers — no hand-written BN backward anywhere.

Semantics match ``tiramisu_fast.fast_apply_train`` (same BN batch-stat
normalization, same running-stat updates, same fold-in dropout chain —
the masks are the SAME realization, drawn with the identical bernoulli
call), which in turn matches ``model.apply(train=True)`` up to dropout
realization.  Parity + gradient gates: tests/test_tiramisu_train_pallas.py.

Scope: single-tile kernels — the whole image must fit VMEM per layer
(true for every training config of the 57/67 family at the reference's
160x120; ``supports()`` reports feasibility so callers can fall back to
the standard path).  Multi-tile would need per-tap center-masked dW
contractions; training inputs never need it.
"""
from __future__ import annotations

import functools
from typing import Any, NamedTuple, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .tiramisu_fast import _bn_update

EPS = 1e-5
LANE = 128
_VMEM_BUDGET = 92 * 1024 * 1024  # of the 100 MiB compiler cap (v5e: 128)


def _ceil(x: int, m: int) -> int:
    return -(-x // m) * m


def _pp(h: int, w: int) -> int:
    """Padded pixel count: rolls wrap circularly, so the buffer needs at
    least w+1 zero lanes after the image for edge taps to read zeros."""
    return _ceil(h * w + w + 1, LANE)


def _to_cm(x: jax.Array, h: int, w: int) -> jax.Array:
    """[B, H, W, C] -> channel-major [B, C, _pp(h, w)] (zero-padded)."""
    b, _, _, c = x.shape
    y = jnp.transpose(x.reshape(b, h * w, c), (0, 2, 1))
    return jnp.pad(y, ((0, 0), (0, 0), (0, _pp(h, w) - h * w)))


def _from_cm(x: jax.Array, h: int, w: int) -> jax.Array:
    return jnp.transpose(x[:, :, :h * w], (0, 2, 1)).reshape(
        x.shape[0], h, w, x.shape[1])


class _Cfg(NamedTuple):
    """Static consumer-layer config (hashable for custom_vjp)."""
    h: int
    w: int
    seg_chans: tuple
    taps: int      # 9 for a 3x3 DenseLayer conv, 1 for TransitionDown's 1x1
    g_out: int
    dtype: str
    interpret: bool


def _masks(cfg: _Cfg, p: int):
    """Validity / column-edge masks over the padded pixel axis."""
    pid = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)
    row = jax.lax.div(pid, cfg.w)
    col = pid - row * cfg.w
    mask_v = (row < cfg.h).astype(jnp.float32)
    mask_l = mask_v * (col != 0)
    mask_r = mask_v * (col != cfg.w - 1)
    return mask_v, mask_l, mask_r


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(cfg: _Cfg, *refs):
    n_seg = len(cfg.seg_chans)
    seg_refs = refs[:n_seg]
    scale_ref, shift_ref, wf_ref, bias_ref, mask_ref = refs[n_seg:n_seg + 5]
    y_ref = refs[n_seg + 5]
    f_scr, g_scr = refs[n_seg + 6:n_seg + 8]

    dtype = jnp.dtype(cfg.dtype)
    p = f_scr.shape[1]
    w, g = cfg.w, cfg.g_out
    mask_v, mask_l, mask_r = _masks(cfg, p)

    # contiguous virtual concat (VMEM->VMEM; restores full-K GEMMs)
    off = 0
    for i, c in enumerate(cfg.seg_chans):
        f_scr[off:off + c, :] = seg_refs[i][0]
        off += c
    c_j = off

    # kn2row GEMM over K chunks, consumer BN affine + ReLU fused at feed
    for kc in range(0, c_j, LANE):
        ck = min(LANE, c_j - kc)
        blk = f_scr[kc:kc + ck, :].astype(jnp.float32)
        a = (jnp.maximum(blk * scale_ref[kc:kc + ck, :]
                         + shift_ref[kc:kc + ck, :], 0.0) * mask_v)
        part = jnp.dot(wf_ref[:, kc:kc + ck], a.astype(dtype),
                       preferred_element_type=jnp.float32)
        if kc == 0:
            g_scr[:, :] = part
        else:
            g_scr[:, :] = g_scr[:, :] + part

    if cfg.taps == 1:
        acc = g_scr[:, :]
    else:
        # y[p] = sum_t G_t[p + off_t] with column-edge masks at p
        acc = None
        for ky in range(3):
            for kx in range(3):
                tap = ky * 3 + kx
                gs = g_scr[tap * g:(tap + 1) * g, :]
                roll = (ky - 1) * w + (kx - 1)
                if roll != 0:
                    gs = pltpu.roll(gs, shift=(-roll) % p, axis=1)
                if kx == 0:
                    gs = gs * mask_l
                elif kx == 2:
                    gs = gs * mask_r
                acc = gs if acc is None else acc + gs

    y = (acc + bias_ref[:, :]) * mask_ref[0] * mask_v
    y_ref[0] = y.astype(dtype)


def _consumer_fwd(cfg: _Cfg, segs, scale, shift, wf, bias, mask):
    bsz = segs[0].shape[0]
    p = segs[0].shape[2]
    c_j = sum(cfg.seg_chans)
    dtype = jnp.dtype(cfg.dtype)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, cfg),
        grid=(bsz,),
        in_specs=[pl.BlockSpec((1, c, p), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)
                  for c in cfg.seg_chans] + [
            pl.BlockSpec(memory_space=pltpu.VMEM),   # scale
            pl.BlockSpec(memory_space=pltpu.VMEM),   # shift
            pl.BlockSpec(memory_space=pltpu.VMEM),   # wf
            pl.BlockSpec(memory_space=pltpu.VMEM),   # bias
            pl.BlockSpec((1, cfg.g_out, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),   # dropout mask
        ],
        out_specs=pl.BlockSpec((1, cfg.g_out, p), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, cfg.g_out, p), dtype),
        scratch_shapes=[
            pltpu.VMEM((c_j, p), dtype),
            pltpu.VMEM((cfg.taps * cfg.g_out, p), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=cfg.interpret,
    )(*segs, scale, shift, wf, bias, mask)


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------

def _bwd_kernel(cfg: _Cfg, *refs):
    n_seg = len(cfg.seg_chans)
    seg_refs = refs[:n_seg]
    (scale_ref, shift_ref, wf_ref, mask_ref,
     dy_ref) = refs[n_seg:n_seg + 5]
    (dseg_ref, dscale_ref, dshift_ref, dwf_ref,
     dbias_ref) = refs[n_seg + 5:n_seg + 10]
    f_scr, g9_scr = refs[n_seg + 10:n_seg + 12]

    dtype = jnp.dtype(cfg.dtype)
    p = f_scr.shape[1]
    w, g = cfg.w, cfg.g_out
    mask_v, mask_l, mask_r = _masks(cfg, p)
    first = pl.program_id(0) == 0
    not_first = jnp.logical_not(first)

    off = 0
    for i, c in enumerate(cfg.seg_chans):
        f_scr[off:off + c, :] = seg_refs[i][0]
        off += c
    c_j = off

    # cotangent at the conv output (pre-dropout, pre-bias): masks are
    # constants of the forward, so they just multiply through
    g_pre = dy_ref[0].astype(jnp.float32) * mask_ref[0] * mask_v

    db = jnp.sum(g_pre, axis=1, keepdims=True)  # [g_out, 1]

    @pl.when(first)
    def _():
        dbias_ref[:, :] = jnp.broadcast_to(db, dbias_ref.shape)

    @pl.when(not_first)
    def _():
        dbias_ref[:, :] = dbias_ref[:, :] + jnp.broadcast_to(
            db, dbias_ref.shape)

    # G9r[t][p] = (g_pre * m_t)[p - off_t]: one matrix feeds BOTH grad
    # GEMMs — dA (contract taps*g) and dW (contract pixels)
    if cfg.taps == 1:
        g9_scr[:, :] = g_pre.astype(dtype)
    else:
        for ky in range(3):
            for kx in range(3):
                tap = ky * 3 + kx
                src = g_pre
                if kx == 0:
                    src = src * mask_l
                elif kx == 2:
                    src = src * mask_r
                roll = (ky - 1) * w + (kx - 1)
                if roll != 0:
                    src = pltpu.roll(src, shift=roll % p, axis=1)
                g9_scr[tap * g:(tap + 1) * g, :] = src.astype(dtype)

    g9 = g9_scr[:, :]
    for kc in range(0, c_j, LANE):
        ck = min(LANE, c_j - kc)
        xk = f_scr[kc:kc + ck, :].astype(jnp.float32)
        sck = scale_ref[kc:kc + ck, :]
        z = xk * sck + shift_ref[kc:kc + ck, :]
        # jnp.maximum splits the tie subgradient 0.5/0.5 at z == 0; exact
        # zeros DO occur in train mode (a channel dropped for the whole
        # batch has mu = 0 and a zero-init BN bias => z == 0 on the whole
        # plane), so matching the XLA paths' convention is load-bearing
        relu_m = ((z > 0.0).astype(jnp.float32)
                  + 0.5 * (z == 0.0).astype(jnp.float32)) * mask_v
        a = (jnp.maximum(z, 0.0) * mask_v).astype(dtype)

        # dW chunk [taps*g, ck] = G9r @ A^T (contract pixels)
        dwk = jax.lax.dot_general(g9, a, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)

        @pl.when(first)
        def _():
            dwf_ref[:, kc:kc + ck] = dwk

        @pl.when(not_first)
        def _():
            dwf_ref[:, kc:kc + ck] = dwf_ref[:, kc:kc + ck] + dwk

        # dA chunk [ck, P] = Wf^T-contraction @ G9r (contract taps*g)
        dak = jax.lax.dot_general(wf_ref[:, kc:kc + ck], g9,
                                  (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        dz = dak * relu_m

        ds = jnp.sum(dz * xk, axis=1, keepdims=True)
        dh = jnp.sum(dz, axis=1, keepdims=True)

        @pl.when(first)
        def _():
            dscale_ref[kc:kc + ck, :] = jnp.broadcast_to(ds, (ck, LANE))
            dshift_ref[kc:kc + ck, :] = jnp.broadcast_to(dh, (ck, LANE))

        @pl.when(not_first)
        def _():
            dscale_ref[kc:kc + ck, :] = (dscale_ref[kc:kc + ck, :]
                                         + jnp.broadcast_to(ds, (ck, LANE)))
            dshift_ref[kc:kc + ck, :] = (dshift_ref[kc:kc + ck, :]
                                         + jnp.broadcast_to(dh, (ck, LANE)))

        dseg_ref[0, kc:kc + ck, :] = (dz * sck).astype(dtype)


def _consumer_bwd_call(cfg: _Cfg, segs, scale, shift, wf, mask, dy):
    bsz = segs[0].shape[0]
    p = segs[0].shape[2]
    c_j = sum(cfg.seg_chans)
    dtype = jnp.dtype(cfg.dtype)
    m = cfg.taps * cfg.g_out
    return pl.pallas_call(
        functools.partial(_bwd_kernel, cfg),
        grid=(bsz,),
        in_specs=[pl.BlockSpec((1, c, p), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)
                  for c in cfg.seg_chans] + [
            pl.BlockSpec(memory_space=pltpu.VMEM),   # scale
            pl.BlockSpec(memory_space=pltpu.VMEM),   # shift
            pl.BlockSpec(memory_space=pltpu.VMEM),   # wf
            pl.BlockSpec((1, cfg.g_out, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),   # mask
            pl.BlockSpec((1, cfg.g_out, p), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),   # dy
        ],
        out_specs=(
            pl.BlockSpec((1, c_j, p), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),       # dseg (full concat)
            pl.BlockSpec((c_j, LANE), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),       # dscale (col 0)
            pl.BlockSpec((c_j, LANE), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),       # dshift (col 0)
            pl.BlockSpec((m, c_j), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),       # dwf
            pl.BlockSpec((cfg.g_out, LANE), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),       # dbias (col 0)
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, c_j, p), dtype),
            jax.ShapeDtypeStruct((c_j, LANE), jnp.float32),
            jax.ShapeDtypeStruct((c_j, LANE), jnp.float32),
            jax.ShapeDtypeStruct((m, c_j), jnp.float32),
            jax.ShapeDtypeStruct((cfg.g_out, LANE), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((c_j, p), dtype),
            pltpu.VMEM((m, p), dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=cfg.interpret,
    )(*segs, scale, shift, wf, mask, dy)


# ---------------------------------------------------------------------------
# custom-vjp consumer primitive
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _consumer(cfg: _Cfg, segs, scale, shift, wf, bias, mask):
    """One consumer layer over the virtual concat: per-channel affine
    (the folded BN slice) -> ReLU -> conv (3x3 kn2row or 1x1) -> +bias ->
    channelwise dropout mask.  Returns the channel-major layer output."""
    return _consumer_fwd(cfg, segs, scale, shift, wf, bias, mask)


def _consumer_fwd_rule(cfg, segs, scale, shift, wf, bias, mask):
    y = _consumer_fwd(cfg, segs, scale, shift, wf, bias, mask)
    return y, (segs, scale, shift, wf, mask)


def _consumer_bwd_rule(cfg, res, dy):
    segs, scale, shift, wf, mask = res
    dfull, dscale, dshift, dwf, dbias = _consumer_bwd_call(
        cfg, segs, scale, shift, wf, mask, dy)
    dsegs, lo = [], 0
    for c in cfg.seg_chans:
        dsegs.append(dfull[:, lo:lo + c, :])
        lo += c
    return (tuple(dsegs), dscale[:, 0:1], dshift[:, 0:1],
            dwf.astype(wf.dtype), dbias[:, 0:1], jnp.zeros_like(mask))


_consumer.defvjp(_consumer_fwd_rule, _consumer_bwd_rule)


# ---------------------------------------------------------------------------
# XLA glue: stats, folds, dropout masks, pooling, transition-up, head
# ---------------------------------------------------------------------------

def _seg_stats_cm(seg, h, w):
    """Batch (mean, var) per channel over (N, valid pixels) — identical
    math to tiramisu_fast._seg_stats (padding lanes are zero by
    construction, so sums over the padded axis are exact)."""
    x = seg.astype(jnp.float32)
    denom = seg.shape[0] * h * w
    mu = jnp.sum(x, axis=(0, 2)) / denom
    var = jnp.maximum(jnp.sum(x * x, axis=(0, 2)) / denom - mu * mu, 0.0)
    return mu, var


def _fold_affine(bn_p, stats):
    """Consumer BN over the virtual concat folded to per-channel affine
    columns; differentiable — jax routes the cotangents through here to
    gamma/beta and (via the per-segment stats) back into the producers."""
    mu = jnp.concatenate([s[0] for s in stats])
    var = jnp.concatenate([s[1] for s in stats])
    scale = (bn_p["scale"] * jax.lax.rsqrt(var + EPS)).astype(jnp.float32)
    shift = bn_p["bias"] - mu * scale
    return scale[:, None], shift[:, None].astype(jnp.float32)


def _drop_mask(key, site, rate, bsz, c):
    """Channelwise dropout mask [B, C, 1] — the SAME bernoulli draw as
    tiramisu_fast._dropout2d's (identical key fold-in, identical shape
    order), so outputs match that path's realization exactly."""
    if rate == 0.0:
        return jnp.ones((bsz, c, 1), jnp.float32)
    keep = jax.random.bernoulli(jax.random.fold_in(key, site), 1.0 - rate,
                                (bsz, 1, 1, c))
    return keep[:, 0, 0, :].astype(jnp.float32)[..., None] / (1.0 - rate)


def _wf3(kernel, dtype):
    """[3, 3, C, G] -> kn2row [9G, C] (tap-major rows)."""
    k = jnp.transpose(kernel, (0, 1, 3, 2))
    return k.reshape(9 * kernel.shape[-1], kernel.shape[-2]).astype(dtype)


def _pool2_cm(x, h, w):
    """2x2 maxpool (floor) channel-major as a reshape + axis max.

    reduce_window's reverse-mode rule lowers to SelectAndScatter
    (measured ~6 ms of the b128 train step); jnp.max over the window
    axes backpropagates as a fused eq-mask.  Forward values identical;
    the subgradient at EXACT in-window ties splits evenly among the
    maxima instead of picking the first.  Ties arise on whole-channel-
    dropped planes (whose cotangents the consumer's dropout mask zeroes
    anyway, QUIRKS.md) but also on any exactly-equal activations — e.g.
    spatially constant input regions — where the even split diverges
    from the reference subgradient at those pixels; gradient mass is
    conserved either way, so the divergence is benign (both in-repo
    train paths agree; grads-vs-Flax gates pass)."""
    b, c = x.shape[0], x.shape[1]
    ho, wo = h // 2, w // 2
    y = x[:, :, :h * w].reshape(b, c, h, w)[:, :, :ho * 2, :wo * 2]
    y = jnp.max(y.reshape(b, c, ho, 2, wo, 2), axis=(3, 5))
    y = y.reshape(b, c, ho * wo)
    return jnp.pad(y, ((0, 0), (0, 0), (0, _pp(ho, wo) - ho * wo)))


def _transition_up_cm(segs, offs, h, w, sh, sw, p, dtype):
    """Stride-2 VALID 3x3 transposed conv over the virtual concat ->
    center-crop, as ONE kn2row GEMM + 4-phase interleave.

    jax.lax.conv_transpose lowers to an input-dilated conv (operand 3/4
    zeros) whose VJP re-dilates both gradient convs — measured 46 ms of
    the 207 ms b128 train step (22%), invariant to K width.  Output
    phase (py, px) = (y mod 2, x mod 2) only ever reads kernel taps with
    ky = py (mod 2), kx = px (mod 2), so the whole op is 9 pointwise
    full-K GEMMs (computed as one [9*O, C] x [C, P] contraction) plus
    zero-pad shifts and a stack/reshape interleave — every piece with a
    clean MXU-shaped VJP and no dilation anywhere."""
    b = segs[0].shape[0]
    x = jnp.concatenate([s[:, :, :h * w] for s in segs], axis=1)
    c = x.shape[1]
    k = p["kernel"]                                   # [3, 3, C, O] HWIO
    o = k.shape[-1]
    kf = jnp.transpose(k, (0, 1, 3, 2)).reshape(9 * o, c)  # tap-major
    y9 = jnp.einsum("mc,bcp->bmp", kf.astype(dtype), x.astype(dtype),
                    preferred_element_type=jnp.float32).astype(dtype)
    # extend one row/col: the VALID output is (2h+1, 2w+1) and the even
    # phases' last row/col read x[h-1]/x[w-1] through the down-shifts
    y9 = jnp.pad(y9.reshape(b, 9, o, h, w),
                 ((0, 0), (0, 0), (0, 0), (0, 1), (0, 1)))

    def dn(t):  # value at row i comes from row i-1 (zero at i=0)
        return jnp.pad(t[:, :, :-1, :], ((0, 0), (0, 0), (1, 0), (0, 0)))

    def rt(t):  # value at col j comes from col j-1 (zero at j=0)
        return jnp.pad(t[:, :, :, :-1], ((0, 0), (0, 0), (0, 0), (1, 0)))

    # conv_transpose (transpose_kernel=False) correlates the UNFLIPPED
    # kernel over the dilated input: out[2i] = k[0] x[i-1] + k[2] x[i]
    tap = lambda ky, kx: y9[:, ky * 3 + kx]
    p00 = rt(dn(tap(0, 0))) + dn(tap(0, 2)) + rt(tap(2, 0)) + tap(2, 2)
    p01 = dn(tap(0, 1)) + tap(2, 1)
    p10 = rt(tap(1, 0)) + tap(1, 2)
    p11 = tap(1, 1)
    he, we = h + 1, w + 1
    r0 = jnp.stack([p00, p01], axis=-1).reshape(b, o, he, 2 * we)
    r1 = jnp.stack([p10, p11], axis=-1).reshape(b, o, he, 2 * we)
    out = jnp.stack([r0, r1], axis=3).reshape(b, o, 2 * he, 2 * we)
    out = out + p["bias"].astype(dtype)[:, None, None]
    y0 = (2 * h + 1 - sh) // 2
    x0 = (2 * w + 1 - sw) // 2
    out = out[:, :, y0:y0 + sh, x0:x0 + sw].reshape(b, o, sh * sw)
    return jnp.pad(out, ((0, 0), (0, 0), (0, _pp(sh, sw) - sh * sw)))


def _offsets(segs):
    offs, lo = [], 0
    for s in segs:
        offs.append((lo, lo + s.shape[1]))
        lo += s.shape[1]
    return offs


def _head_cm(model, variables, segs, h, w, dtype, use_softmax):
    """Per-segment L2 norm + 1x1 classifier + T-softmax, channel-major
    (tiramisu_fast._l2_classifier_head)."""
    norm2 = None
    for seg in segs:
        sq = jnp.sum(seg.astype(jnp.float32) ** 2, axis=1, keepdims=True)
        norm2 = sq if norm2 is None else norm2 + sq
    # clamp BEFORE the sqrt: forward-identical to max(sqrt(n2), 1e-12),
    # but the sqrt gradient at the zero-PADDED pixels (which only this
    # channel-major layout has) is 0 instead of inf — inf * (zero
    # cotangent from the unpad slice) would be NaN
    norm = jnp.sqrt(jnp.maximum(norm2, 1e-24))

    cl_p = variables["params"]["classifier"]["finalConv"]
    logits = None
    for seg, (lo, hi) in zip(segs, _offsets(segs)):
        wk = cl_p["kernel"][0, 0][lo:hi, :].astype(dtype)  # [C_s, n_cls]
        y = jnp.einsum("bcp,cn->bnp", seg.astype(dtype), wk)
        logits = y if logits is None else logits + y
    logits = logits.astype(jnp.float32) / norm + cl_p["bias"][:, None]
    logits = logits / 0.05  # classifier temperature (T=0.05)
    out = _from_cm(logits, h, w)
    if use_softmax:
        out = jax.nn.softmax(out, axis=-1)
    return out


# ---------------------------------------------------------------------------
# fused dense-block backward (round 5 — VERDICT r04 item #2)
# ---------------------------------------------------------------------------
#
# The per-consumer custom VJP above materializes a [c_j, P] input
# cotangent per layer (dseg), which XLA then sums per segment — the
# round-4 breakdown located the backward's cost (97.4 vs 43.7 ms fwd at
# b64) in exactly this O(n^2 g P) HBM traffic.  A single fused reverse
# sweep over the whole block is IMPOSSIBLE with train-mode BatchNorm:
# every layer's folded (scale, shift) depends on batch-global statistics
# of all earlier layer outputs, so the reverse chain needs a batch-wide
# reduction between consecutive layer stages (the gradient through
# mu/var of y_j uses dscale/dshift of layers > j summed over the WHOLE
# batch — not available inside a batch-gridded kernel at stage j).
#
# What CAN be removed is the cotangent materialization.  The block
# backward below keeps one kernel per layer stage (the batch sync
# between stages rides the pallas_call boundary, as it must) but
# compresses all inter-stage cotangent traffic to the g-channel
# pre-activation gradient g_pre_j = dy_j * dropout_mask * valid_mask:
#
#   * stage j computes its OWN dy_j by RECOMPUTING the later layers'
#     contributions from their stored g_pre's — per later layer l one
#     [g, 9g] x [9g, P] GEMM (the Y_j-channel rows of Wf_l against the
#     rebuilt rolled-cotangent matrix) plus a relu-mask recompute from
#     Y_j's resident values.  FLOPs are free here (the step runs at ~6%
#     MXU); the [c_l, P] dseg write + XLA re-read they replace is not.
#   * the BN statistics / fold backward stays OUTSIDE the kernels in
#     autodiff-derived glue: per-channel (dscale, dshift) accumulated by
#     each stage kernel are pulled back through jax.vjp of the tiny fold
#     and stats functions, and the resulting [B, g, P] correction to
#     dy_j is handed to stage j as part of its external cotangent.  No
#     hand-written BN backward anywhere (same contract as the
#     per-consumer design).
#   * one FINAL kernel computes the block-input segment cotangents for
#     all n layers in a single pass over the c_in input channels.
#
# Block HBM traffic drops from ~3·Σc_j·P (segments in + dseg out + XLA
# add re-read) to ~Σc_j·P + 2·c_in·P + O(n·g·P); gradients are
# bit-comparable (f32 accumulation in place of XLA's bf16 slice sums —
# exactly equal in the f32-policy parity gates).
#
# Ablation/fallback: S2R_FUSED_BLOCK_BWD=0 restores the per-consumer
# path (read at trace time).


class _StageCfg(NamedTuple):
    h: int
    w: int
    seg_chans: tuple   # channels of THIS consumer's input segments
    g_out: int
    n_later: int
    dtype: str
    interpret: bool


class _FinalCfg(NamedTuple):
    h: int
    w: int
    seg_chans: tuple   # block-input segment channels
    g_out: int
    n_layers: int
    dtype: str
    interpret: bool


def _g9_build(g_pre, g9_scr, w, p, g, mask_l, mask_r, dtype):
    """Write the rolled-cotangent matrix G9r into scratch: G9r[t] =
    roll(g_pre * m_t, off_t) — identical to _bwd_kernel's build, so a
    later stage's rebuild from the STORED g_pre equals the matrix the
    producing stage used (the column-edge masks are exact 0/1, so the
    store-dtype rounding commutes with them)."""
    # Mosaic's tpu.dynamic_rotate only handles 32-bit lanes; callers pass
    # g_pre either as f32 (the producing stage) or as the STORED bf16
    # copy (later-stage rebuilds), so roll in f32 unconditionally.  The
    # rebuild stays exact: roll commutes with the store-dtype cast
    # (cast∘perm == perm∘cast and cast is idempotent), and the masks are
    # exact 0/1.
    g_pre = g_pre.astype(jnp.float32)
    for ky in range(3):
        for kx in range(3):
            tap = ky * 3 + kx
            src = g_pre
            if kx == 0:
                src = src * mask_l
            elif kx == 2:
                src = src * mask_r
            roll = (ky - 1) * w + (kx - 1)
            if roll != 0:
                src = pltpu.roll(src, shift=roll % p, axis=1)
            g9_scr[tap * g:(tap + 1) * g, :] = src.astype(dtype)


def _stage_kernel(cfg: _StageCfg, *refs):
    m, L = len(cfg.seg_chans), cfg.n_later
    i = 0
    seg_refs = refs[i:i + m]; i += m
    y_ref = refs[i]; i += 1
    ext_ref = refs[i]; i += 1
    gp_refs = refs[i:i + L]; i += L
    wf_ref = refs[i]; i += 1
    wfs_refs = refs[i:i + L]; i += L
    scale_ref, shift_ref = refs[i:i + 2]; i += 2
    scs_refs = refs[i:i + L]; i += L
    shs_refs = refs[i:i + L]; i += L
    mask_ref = refs[i]; i += 1
    (gp_out, dwf_ref, dscale_ref, dshift_ref,
     dbias_ref) = refs[i:i + 5]; i += 5
    f_scr, g9_scr = refs[i:i + 2]

    dtype = jnp.dtype(cfg.dtype)
    p = f_scr.shape[1]
    w, g = cfg.w, cfg.g_out
    mask_v, mask_l, mask_r = _masks(cfg, p)
    first = pl.program_id(0) == 0
    not_first = jnp.logical_not(first)

    # dy_j = external cotangent (incl. the glue-computed stats
    # correction) + recomputed contributions from every later consumer
    dy = ext_ref[0]
    if L:
        yv = y_ref[0].astype(jnp.float32)
    for l in range(L):
        _g9_build(gp_refs[l][0], g9_scr, w, p, g, mask_l, mask_r, dtype)
        dA = jax.lax.dot_general(wfs_refs[l][:, :], g9_scr[:, :],
                                 (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        sc = scs_refs[l][:, :]
        z = yv * sc + shs_refs[l][:, :]
        relu_m = ((z > 0.0).astype(jnp.float32)
                  + 0.5 * (z == 0.0).astype(jnp.float32)) * mask_v
        dy = dy + dA * relu_m * sc

    g_pre = dy * mask_ref[0] * mask_v
    gp_out[0] = g_pre.astype(dtype)

    db = jnp.sum(g_pre, axis=1, keepdims=True)

    @pl.when(first)
    def _():
        dbias_ref[:, :] = jnp.broadcast_to(db, dbias_ref.shape)

    @pl.when(not_first)
    def _():
        dbias_ref[:, :] = dbias_ref[:, :] + jnp.broadcast_to(
            db, dbias_ref.shape)

    # own-layer wgrad + per-channel dscale/dshift (the dgrad GEMM runs
    # only to feed them — its [c_j, P] result is never written to HBM)
    off = 0
    for si, c in enumerate(cfg.seg_chans):
        f_scr[off:off + c, :] = seg_refs[si][0]
        off += c
    c_j = off
    _g9_build(g_pre, g9_scr, w, p, g, mask_l, mask_r, dtype)
    g9 = g9_scr[:, :]
    for kc in range(0, c_j, LANE):
        ck = min(LANE, c_j - kc)
        xk = f_scr[kc:kc + ck, :].astype(jnp.float32)
        sck = scale_ref[kc:kc + ck, :]
        z = xk * sck + shift_ref[kc:kc + ck, :]
        relu_m = ((z > 0.0).astype(jnp.float32)
                  + 0.5 * (z == 0.0).astype(jnp.float32)) * mask_v
        a = (jnp.maximum(z, 0.0) * mask_v).astype(dtype)

        dwk = jax.lax.dot_general(g9, a, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)

        @pl.when(first)
        def _():
            dwf_ref[:, kc:kc + ck] = dwk

        @pl.when(not_first)
        def _():
            dwf_ref[:, kc:kc + ck] = dwf_ref[:, kc:kc + ck] + dwk

        dak = jax.lax.dot_general(wf_ref[:, kc:kc + ck], g9,
                                  (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        dz = dak * relu_m
        ds = jnp.sum(dz * xk, axis=1, keepdims=True)
        dh = jnp.sum(dz, axis=1, keepdims=True)

        @pl.when(first)
        def _():
            dscale_ref[kc:kc + ck, :] = jnp.broadcast_to(ds, (ck, LANE))
            dshift_ref[kc:kc + ck, :] = jnp.broadcast_to(dh, (ck, LANE))

        @pl.when(not_first)
        def _():
            dscale_ref[kc:kc + ck, :] = (dscale_ref[kc:kc + ck, :]
                                         + jnp.broadcast_to(ds, (ck, LANE)))
            dshift_ref[kc:kc + ck, :] = (dshift_ref[kc:kc + ck, :]
                                         + jnp.broadcast_to(dh, (ck, LANE)))


def _stage_call(cfg: _StageCfg, segs, y, ext, gps, wf, wf_slices,
                scale, shift, sc_slices, sh_slices, mask):
    bsz = y.shape[0]
    p = y.shape[2]
    c_j = sum(cfg.seg_chans)
    g = cfg.g_out
    dtype = jnp.dtype(cfg.dtype)
    m = 9 * g
    per_b = lambda c: pl.BlockSpec((1, c, p), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM)
    whole = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_stage_kernel, cfg),
        grid=(bsz,),
        in_specs=([per_b(c) for c in cfg.seg_chans]
                  + [per_b(g), per_b(g)]                    # y, ext
                  + [per_b(g) for _ in gps]                 # later g_pres
                  + [whole()]                               # wf
                  + [whole() for _ in wf_slices]
                  + [whole(), whole()]                      # scale, shift
                  + [whole() for _ in sc_slices]
                  + [whole() for _ in sh_slices]
                  + [pl.BlockSpec((1, g, 1), lambda b: (b, 0, 0),
                                  memory_space=pltpu.VMEM)]),  # mask
        out_specs=(
            per_b(g),                                          # g_pre
            pl.BlockSpec((m, c_j), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),             # dwf
            pl.BlockSpec((c_j, LANE), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),             # dscale
            pl.BlockSpec((c_j, LANE), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),             # dshift
            pl.BlockSpec((g, LANE), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),             # dbias
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, g, p), dtype),
            jax.ShapeDtypeStruct((m, c_j), jnp.float32),
            jax.ShapeDtypeStruct((c_j, LANE), jnp.float32),
            jax.ShapeDtypeStruct((c_j, LANE), jnp.float32),
            jax.ShapeDtypeStruct((g, LANE), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((c_j, p), dtype),
            pltpu.VMEM((m, p), dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=cfg.interpret,
    )(*segs, y, ext, *gps, wf, *wf_slices, scale, shift,
      *sc_slices, *sh_slices, mask)


def _final_kernel(cfg: _FinalCfg, *refs):
    m, n = len(cfg.seg_chans), cfg.n_layers
    i = 0
    seg_refs = refs[i:i + m]; i += m
    gp_refs = refs[i:i + n]; i += n
    wfs_refs = refs[i:i + n]; i += n
    scs_refs = refs[i:i + n]; i += n
    shs_refs = refs[i:i + n]; i += n
    dseg_ref = refs[i]; i += 1
    f_scr, g9_scr, acc_scr = refs[i:i + 3]

    dtype = jnp.dtype(cfg.dtype)
    p = f_scr.shape[1]
    w, g = cfg.w, cfg.g_out
    mask_v, mask_l, mask_r = _masks(cfg, p)

    off = 0
    for si, c in enumerate(cfg.seg_chans):
        f_scr[off:off + c, :] = seg_refs[si][0]
        off += c
    c_in = off

    for l in range(n):
        _g9_build(gp_refs[l][0], g9_scr, w, p, g, mask_l, mask_r, dtype)
        g9 = g9_scr[:, :]
        for kc in range(0, c_in, LANE):
            ck = min(LANE, c_in - kc)
            dak = jax.lax.dot_general(wfs_refs[l][:, kc:kc + ck], g9,
                                      (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            xk = f_scr[kc:kc + ck, :].astype(jnp.float32)
            sck = scs_refs[l][kc:kc + ck, :]
            z = xk * sck + shs_refs[l][kc:kc + ck, :]
            relu_m = ((z > 0.0).astype(jnp.float32)
                      + 0.5 * (z == 0.0).astype(jnp.float32)) * mask_v
            t = dak * relu_m * sck
            if l == 0:
                acc_scr[kc:kc + ck, :] = t
            else:
                acc_scr[kc:kc + ck, :] = acc_scr[kc:kc + ck, :] + t

    dseg_ref[0] = acc_scr[:, :].astype(dtype)


def _final_call(cfg: _FinalCfg, segs, gps, wf_slices, sc_slices, sh_slices):
    bsz = segs[0].shape[0]
    p = segs[0].shape[2]
    c_in = sum(cfg.seg_chans)
    g = cfg.g_out
    dtype = jnp.dtype(cfg.dtype)
    per_b = lambda c: pl.BlockSpec((1, c, p), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM)
    whole = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_final_kernel, cfg),
        grid=(bsz,),
        in_specs=([per_b(c) for c in cfg.seg_chans]
                  + [per_b(g) for _ in gps]
                  + [whole() for _ in wf_slices]
                  + [whole() for _ in sc_slices]
                  + [whole() for _ in sh_slices]),
        out_specs=per_b(c_in),
        out_shape=jax.ShapeDtypeStruct((bsz, c_in, p), dtype),
        scratch_shapes=[
            pltpu.VMEM((c_in, p), dtype),
            pltpu.VMEM((9 * g, p), dtype),
            pltpu.VMEM((c_in, p), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=cfg.interpret,
    )(*segs, *gps, *wf_slices, *sc_slices, *sh_slices)


class _BlkCfg(NamedTuple):
    h: int
    w: int
    seg_chans: tuple   # block-input segment channels
    n_layers: int
    g_out: int
    dtype: str
    interpret: bool


def _fold_vec(gamma, beta, mu, var):
    """_fold_affine on raw vectors (same ops, so forward values agree
    bitwise); jax.vjp of THIS function is the fold backward."""
    scale = (gamma * jax.lax.rsqrt(var + EPS)).astype(jnp.float32)
    shift = beta - mu * scale
    return scale[:, None], shift[:, None].astype(jnp.float32)


def _fused_block_core(cfg: _BlkCfg, segs, mu_in, var_in, gammas, betas,
                      wfs, biases, masks):
    """The block forward shared by the primal and the fwd rule: per-layer
    fused consumer kernels, folds from (params, stats) exactly as the
    per-consumer path computes them."""
    cur = list(segs)
    cur_mu, cur_var = list(mu_in), list(var_in)
    ys, mus_y, vars_y = [], [], []
    for j in range(cfg.n_layers):
        scale, shift = _fold_vec(gammas[j], betas[j],
                                 jnp.concatenate(cur_mu),
                                 jnp.concatenate(cur_var))
        ccfg = _Cfg(cfg.h, cfg.w, tuple(s.shape[1] for s in cur), 9,
                    cfg.g_out, cfg.dtype, cfg.interpret)
        y = _consumer_fwd(ccfg, tuple(cur), scale, shift, wfs[j],
                          biases[j], masks[j])
        mu, var = _seg_stats_cm(y, cfg.h, cfg.w)
        cur.append(y)
        cur_mu.append(mu)
        cur_var.append(var)
        ys.append(y)
        mus_y.append(mu)
        vars_y.append(var)
    return tuple(ys), tuple(mus_y), tuple(vars_y)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_block(cfg: _BlkCfg, segs, mu_in, var_in, gammas, betas,
                 wfs, biases, masks):
    """A whole train-mode DenseBlock as one differentiable primitive —
    forward identical to the per-consumer path; backward is the fused
    reverse sweep described in the section comment above."""
    ys, _, _ = _fused_block_core(cfg, segs, mu_in, var_in, gammas, betas,
                                 wfs, biases, masks)
    return ys


def _fused_block_fwd_rule(cfg, segs, mu_in, var_in, gammas, betas,
                          wfs, biases, masks):
    ys, mus_y, vars_y = _fused_block_core(cfg, segs, mu_in, var_in,
                                          gammas, betas, wfs, biases, masks)
    return ys, (segs, ys, mu_in, var_in, mus_y, vars_y, gammas, betas,
                wfs, masks)


def _fused_block_bwd_rule(cfg, res, dys):
    (segs, ys, mu_in, var_in, mus_y, vars_y, gammas, betas,
     wfs, masks) = res
    n, g, h, w = cfg.n_layers, cfg.g_out, cfg.h, cfg.w
    c_in = sum(cfg.seg_chans)
    c_all = c_in + n * g

    # folds recomputed with their vjps (per-channel vectors — tiny)
    folds, fold_vjps = [], []
    for j in range(n):
        mu_full = jnp.concatenate(list(mu_in) + list(mus_y[:j]))
        var_full = jnp.concatenate(list(var_in) + list(vars_y[:j]))
        (scale, shift), vjp_fn = jax.vjp(_fold_vec, gammas[j], betas[j],
                                         mu_full, var_full)
        folds.append((scale, shift))
        fold_vjps.append(vjp_fn)

    acc_dmu = jnp.zeros((c_all,), jnp.float32)
    acc_dvar = jnp.zeros((c_all,), jnp.float32)
    g_pres = [None] * n
    dgammas, dbetas, dwfs, dbiases = ([None] * n for _ in range(4))

    for j in reversed(range(n)):
        ext = dys[j].astype(jnp.float32)
        lo = c_in + j * g
        if j < n - 1:
            # stats correction: later layers' folds read mu/var of Y_j;
            # their accumulated per-channel cotangents pull back through
            # autodiff of the stats function into a [B, g, P] term
            _, stats_vjp = jax.vjp(
                lambda t: _seg_stats_cm(t, h, w), ys[j])
            (corr,) = stats_vjp((acc_dmu[lo:lo + g], acc_dvar[lo:lo + g]))
            ext = ext + corr.astype(jnp.float32)
        later = range(j + 1, n)
        scfg = _StageCfg(h, w, tuple(s.shape[1] for s in
                                     list(segs) + list(ys[:j])),
                         g, n - 1 - j, cfg.dtype, cfg.interpret)
        gp, dwf, dsc, dsh, db = _stage_call(
            scfg, tuple(segs) + tuple(ys[:j]), ys[j], ext,
            [g_pres[l] for l in later], wfs[j],
            [wfs[l][:, lo:lo + g] for l in later],
            folds[j][0], folds[j][1],
            [folds[l][0][lo:lo + g] for l in later],
            [folds[l][1][lo:lo + g] for l in later],
            masks[j])
        g_pres[j] = gp
        dwfs[j] = dwf.astype(wfs[j].dtype)
        dbiases[j] = db[:, 0:1]
        dg, dbta, dmu_full, dvar_full = fold_vjps[j](
            (dsc[:, 0:1], dsh[:, 0:1]))
        dgammas[j] = dg
        dbetas[j] = dbta
        c_j = c_in + j * g
        acc_dmu = acc_dmu.at[:c_j].add(dmu_full)
        acc_dvar = acc_dvar.at[:c_j].add(dvar_full)

    fcfg = _FinalCfg(h, w, cfg.seg_chans, g, n, cfg.dtype, cfg.interpret)
    dfull = _final_call(fcfg, tuple(segs), g_pres,
                        [wfs[l][:, :c_in] for l in range(n)],
                        [folds[l][0][:c_in] for l in range(n)],
                        [folds[l][1][:c_in] for l in range(n)])
    dsegs, dmu_in, dvar_in = [], [], []
    lo = 0
    for c in cfg.seg_chans:
        dsegs.append(dfull[:, lo:lo + c, :])
        dmu_in.append(acc_dmu[lo:lo + c])
        dvar_in.append(acc_dvar[lo:lo + c])
        lo += c
    return (tuple(dsegs), tuple(dmu_in), tuple(dvar_in), tuple(dgammas),
            tuple(dbetas), tuple(dwfs), tuple(dbiases),
            tuple(jnp.zeros_like(m) for m in masks))


_fused_block.defvjp(_fused_block_fwd_rule, _fused_block_bwd_rule)


def _block_tp(segs, stats, params, old_stats, n_layers, rate, key, site,
              h, w, dtype, interpret, growth):
    """Train-mode DenseBlock; stats + BN running updates mirror
    tiramisu_fast._dense_block_train exactly.  Default path: the fused
    block primitive (_fused_block — per-consumer forward kernels, fused
    reverse sweep).  S2R_FUSED_BLOCK_BWD=0 falls back to one _consumer
    custom-VJP call per layer."""
    import os

    bsz = segs[0].shape[0]
    if os.environ.get("S2R_FUSED_BLOCK_BWD", "1") != "0":
        dname = jnp.dtype(dtype).name
        cfg = _BlkCfg(h, w, tuple(s.shape[1] for s in segs), n_layers,
                      growth, dname, interpret)
        layer_p = [params[f"DenseLayer_{j}"] for j in range(n_layers)]
        ys = _fused_block(
            cfg, tuple(segs),
            tuple(s[0] for s in stats), tuple(s[1] for s in stats),
            tuple(lp["BatchNorm_0"]["scale"] for lp in layer_p),
            tuple(lp["BatchNorm_0"]["bias"] for lp in layer_p),
            tuple(_wf3(lp["Conv_0"]["kernel"], dtype) for lp in layer_p),
            tuple(lp["Conv_0"]["bias"].astype(jnp.float32)[:, None]
                  for lp in layer_p),
            tuple(_drop_mask(key, site + j, rate, bsz, growth)
                  for j in range(n_layers)))
        site += n_layers
        cur, cur_stats = list(segs), list(stats)
        new, new_stats, updates = [], [], {}
        for j, y in enumerate(ys):
            updates[f"DenseLayer_{j}"] = {"BatchNorm_0": _bn_update(
                old_stats[f"DenseLayer_{j}"]["BatchNorm_0"], cur_stats)}
            st = _seg_stats_cm(y, h, w)
            cur.append(y)
            cur_stats.append(st)
            new.append(y)
            new_stats.append(st)
        return cur, cur_stats, new, new_stats, updates, site

    cur, cur_stats = list(segs), list(stats)
    new, new_stats, updates = [], [], {}
    for j in range(n_layers):
        lp = params[f"DenseLayer_{j}"]
        scale, shift = _fold_affine(lp["BatchNorm_0"], cur_stats)
        cfg = _Cfg(h, w, tuple(s.shape[1] for s in cur), 9, growth,
                   jnp.dtype(dtype).name, interpret)
        y = _consumer(cfg, tuple(cur), scale, shift,
                      _wf3(lp["Conv_0"]["kernel"], dtype),
                      lp["Conv_0"]["bias"].astype(jnp.float32)[:, None],
                      _drop_mask(key, site, rate, bsz, growth))
        site += 1
        st = _seg_stats_cm(y, h, w)
        updates[f"DenseLayer_{j}"] = {"BatchNorm_0": _bn_update(
            old_stats[f"DenseLayer_{j}"]["BatchNorm_0"], cur_stats)}
        cur.append(y)
        cur_stats.append(st)
        new.append(y)
        new_stats.append(st)
    return cur, cur_stats, new, new_stats, updates, site


def supports(model, height: int, width: int) -> bool:
    """Whether the single-tile kernels fit VMEM for this model/resolution
    (the trainers fall back to the standard apply when they don't)."""
    from .tiramisu import FCDenseNet
    if not isinstance(model, FCDenseNet):
        return False
    itemsize = jnp.dtype(model.policy.compute_dtype).itemsize

    def blk_worst(c_in, n, h, w):
        """VMEM bound for one block's kernels at (h, w): the per-layer
        forward, the fused-backward stage kernel (segs in + concat
        scratch + G9r + later g_pres + f32 chunk temps), the fused
        final kernel (segs + concat scratch + f32 accumulator), and the
        legacy per-consumer backward (env-selectable fallback)."""
        g = model.growth_rate
        p = _pp(h, w)
        c_j = c_in + (n - 1) * g
        fwd = p * ((c_j + max(c_j, 9 * g)) * itemsize + 9 * g * 4)
        stage = p * (2 * c_j * itemsize + (9 + n + 1) * g * itemsize
                     + 8 * g + LANE * 12)
        final = p * (c_in * (2 * itemsize + 4) + (9 + n) * g * itemsize
                     + LANE * 12)
        legacy = p * (c_j * (4 * itemsize) + 9 * g * (4 + itemsize)
                      + LANE * 8)
        return max(fwd, stage, final, legacy)

    g = model.growth_rate
    h, w = height, width
    cur = model.out_chans_first_conv
    skips = []
    worst = 0
    for n in model.down_blocks:
        worst = max(worst, blk_worst(cur, n, h, w))
        cur += g * n
        skips.insert(0, (cur, h, w))
        worst = max(worst, _pp(h, w) * cur * (2 * itemsize + 4))  # TD
        h, w = h // 2, w // 2
    worst = max(worst, blk_worst(cur, model.bottleneck_layers, h, w))
    prev = g * model.bottleneck_layers
    for i, n in enumerate(model.up_blocks):
        c_in, h, w = skips[i]
        worst = max(worst, blk_worst(prev + c_in, n, h, w))
        prev = g * n
    return worst <= _VMEM_BUDGET


def pallas_apply_train(model, variables, x, key, *, use_softmax: bool = True,
                       reverse_features: bool = False,
                       interpret: bool | None = None):
    """Train-mode forward of an ``FCDenseNet`` with fused consumer-layer
    kernels.  Drop-in for ``tiramisu_fast.fast_apply_train`` (same
    signature, same outputs INCLUDING the dropout realization, same
    (output, new_batch_stats) return); differentiable via the per-layer
    custom VJPs.  ``reverse_features`` inserts MME's gradient reversal
    before the head (grad_reverse distributes over segments — see
    fast_apply_train's docstring)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    dtype = model.policy.compute_dtype
    rate = model.dropout_rate
    fe_p = variables["params"]["featureExtractor"]
    fe_s = variables["batch_stats"]["featureExtractor"]
    g = model.growth_rate
    bsz, h, w, _ = x.shape
    new_fe = {}
    site = 0

    y = jax.lax.conv_general_dilated(
        x.astype(dtype), fe_p["firstconv"]["kernel"].astype(dtype), (1, 1),
        ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y + fe_p["firstconv"]["bias"].astype(dtype)
    y = _to_cm(y, h, w)
    segs, stats = [y], [_seg_stats_cm(y, h, w)]

    skips, skip_stats, dims = [], [], [(h, w)]
    for i, n in enumerate(model.down_blocks):
        hh, ww = dims[-1]
        segs, stats, _, _, upd, site = _block_tp(
            segs, stats, fe_p[f"denseDown{i}"], fe_s[f"denseDown{i}"],
            n, rate, key, site, hh, ww, dtype, interpret, g)
        new_fe[f"denseDown{i}"] = upd
        skips.append(segs)
        skip_stats.append(stats)

        tp = fe_p[f"transDown{i}"]
        c_tot = sum(s.shape[1] for s in segs)
        scale, shift = _fold_affine(tp["BatchNorm_0"], stats)
        cfg = _Cfg(hh, ww, tuple(s.shape[1] for s in segs), 1, c_tot,
                   jnp.dtype(dtype).name, interpret)
        td = _consumer(cfg, tuple(segs), scale, shift,
                       tp["Conv_0"]["kernel"][0, 0].T.astype(dtype),
                       tp["Conv_0"]["bias"].astype(jnp.float32)[:, None],
                       _drop_mask(key, site, rate, bsz, c_tot))
        site += 1
        new_fe[f"transDown{i}"] = {"BatchNorm_0": _bn_update(
            fe_s[f"transDown{i}"]["BatchNorm_0"], stats)}
        td = _pool2_cm(td, hh, ww)
        dims.append((hh // 2, ww // 2))
        segs = [td]
        stats = [_seg_stats_cm(td, dims[-1][0], dims[-1][1])]

    hh, ww = dims[-1]
    _, _, segs, stats, upd, site = _block_tp(
        segs, stats, fe_p["bottleneck"], fe_s["bottleneck"],
        model.bottleneck_layers, rate, key, site, hh, ww, dtype,
        interpret, g)
    new_fe["bottleneck"] = upd

    for i, n in enumerate(model.up_blocks):
        skip, skst = skips.pop(), skip_stats.pop()
        sh, sw = dims[-2 - i]
        up = _transition_up_cm(segs, _offsets(segs), hh, ww, sh, sw,
                               fe_p[f"transUp{i}"]["ConvTranspose_0"], dtype)
        hh, ww = sh, sw
        segs = [up] + list(skip)
        stats = [_seg_stats_cm(up, hh, ww)] + list(skst)
        last = i == len(model.up_blocks) - 1
        all_segs, all_stats, new_segs, new_stats, upd, site = _block_tp(
            segs, stats, fe_p[f"denseUp{i}"], fe_s[f"denseUp{i}"],
            n, rate, key, site, hh, ww, dtype, interpret, g)
        new_fe[f"denseUp{i}"] = upd
        segs, stats = ((all_segs, all_stats) if last
                       else (new_segs, new_stats))

    if reverse_features:
        from .tiramisu import grad_reverse
        segs = [grad_reverse(s) for s in segs]
    out = _head_cm(model, variables, segs, h, w, dtype, use_softmax)
    return out, {"featureExtractor": new_fe}
