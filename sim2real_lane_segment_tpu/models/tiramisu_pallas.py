"""Fused Pallas dense-block kernel: FC-DenseNet inference at HBM-traffic
~parity with plain CNNs.

Why: profiling the XLA forward (both the standard flax apply and the
segment-wise ``tiramisu_fast``) on TPU v5e shows FC-DenseNet67 is
HBM-bandwidth-bound, not MXU-bound — ~380 MB of HBM traffic per 160x120
frame at ~680 GB/s sustained, because every DenseLayer (reference
rightLaneNetwork/models/FCDenseNet/layers.py:5-25) applies its own
BatchNorm to the whole concatenated input, so XLA materializes a fresh
BN->ReLU(concat) tensor in HBM per layer (conv operands cannot fuse with
their producers).

This kernel runs a whole DenseBlock per spatial tile with the growing
feature buffer resident in VMEM, in CHANNEL-MAJOR ([C, pixels]) layout:

- The feature buffer F [c_total, P] lives in VMEM scratch for the
  duration of the block; each layer's growth-channel output lands in its
  sublane row slice.  Inter-layer activations never touch HBM.
- Each layer's 3x3 conv uses the kn2row decomposition: ONE GEMM
  Wf^T[9*growth, C_j] @ A[C_j, P] (the 9 taps' 1x1 kernels stacked along
  the OUTPUT-SUBLANE axis) followed by 9 shift-adds.  Lanes carry the
  pixel axis, so the MXU N dimension is always full, and each tap's
  shift-add touches exactly its own 16 sublane rows — measured ~6x
  faster than the row-major ([P, C]) formulation, where every
  16-of-128-lane slice op cost a full-width vector pass.
- BatchNorm (inference, running stats) is folded to per-layer scale and
  shift columns applied as a K-chunk of F is fed to the MXU; Dropout2d
  is inference-identity.
- Channel-major makes alignment trivial: channel counts (sublanes) only
  need multiples of 8 — every real FC-DenseNet channel count is a
  multiple of 16 — so block inputs are passed as a LIST of segments
  (e.g. [transition-up output, skip]) DMA'd directly into their F row
  range, with no lane padding, staging, or compaction.  Only the pixel
  axis (lanes) pads to multiples of 128, and only for levels whose H*W
  is not already one.
- Tiles use a CIRCULAR pixel layout [center | bottom halo | top halo]:
  ``pltpu.roll`` wraparound lands reads of row -1 exactly on the top
  halo.  Halo DMA sizes round up to 128 px; the slop lands in circular
  positions that are already invalid.  Pixels outside the image are
  masked to zero at the BN->ReLU output (conv zero padding applies to
  the conv INPUT), which also neutralizes stale halo data.  A row is
  valid after layer j iff its +-1 neighbours were valid after j-1, so
  the central ``tile_rows`` rows are exact after n_layers layers
  (overlap-shrink).

The XLA glue (firstconv, transitions, classifier) also runs channel-
major: 1x1 convs become einsums, pooling reshapes to [B, C, H, W] —
only the network input and the logits output transpose layouts.

Output parity with ``model.apply(..., train=False)`` is gated in
tests/test_tiramisu_pallas.py (interpret mode on CPU, compiled on TPU).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-5
DN = ("NHWC", "HWIO", "NHWC")
_VMEM_BUDGET = 48 * 1024 * 1024        # tiled kernel (scratch + temporaries)
_PACK_BUDGET = 64 * 1024 * 1024        # packed kernel: more slack measured
LANE = 128


def _ceil(x, m):
    return -(-x // m) * m


# ---------------------------------------------------------------------------
# parameter folding
# ---------------------------------------------------------------------------

def _fold_block_params(params, stats, n_layers, growth, k_max, dtype):
    """Fold each DenseLayer's BN into (scale, shift) columns and flatten
    its conv kernel to transposed kn2row layout [n, 9*growth, k_max]."""
    scales, shifts, wfs, biases = [], [], [], []
    for j in range(n_layers):
        lp, ls = params[f"DenseLayer_{j}"], stats[f"DenseLayer_{j}"]
        bn, bs = lp["BatchNorm_0"], ls["BatchNorm_0"]
        scale = bn["scale"] * jax.lax.rsqrt(bs["var"] + EPS)
        shift = bn["bias"] - bs["mean"] * scale
        k = scale.shape[0]
        pad = k_max - k
        scales.append(jnp.pad(scale.astype(jnp.float32), (0, pad)))
        shifts.append(jnp.pad(shift.astype(jnp.float32), (0, pad)))
        w = lp["Conv_0"]["kernel"]  # [3, 3, C_j, growth]
        wf = jnp.transpose(w, (0, 1, 3, 2)).reshape(9 * growth, k)
        wfs.append(jnp.pad(wf.astype(dtype), ((0, 0), (0, pad))))
        biases.append(lp["Conv_0"]["bias"].astype(jnp.float32))
    return (jnp.stack(scales).T, jnp.stack(shifts).T, jnp.stack(wfs),
            jnp.stack(biases))


def _pick_tile_rows(h, w, c_total, growth, n_layers, itemsize, align):
    """Largest tile-row count whose VMEM footprint fits the budget.
    Multi-tile requires tr | h and tr*w % align == 0 (lane-aligned DMA;
    align=1 in interpret mode)."""
    def fits(tr, single):
        trw = _ceil(tr * w, align) if single else tr * w
        p = trw + 2 * _ceil(n_layers * w, align)
        f_b = _ceil(c_total, 8) * p * itemsize
        g_b = _ceil(9 * growth, 8) * p * 4
        x_b = _ceil(c_total, 8) * trw * itemsize  # prefetch buffer bound
        tmp = LANE * p * (itemsize + 4)
        return f_b + g_b + x_b + tmp <= _VMEM_BUDGET

    if fits(h, True):
        return h
    for tr in sorted((d for d in range(1, h) if h % d == 0), reverse=True):
        if (tr * w) % align == 0 and fits(tr, False):
            return tr
    raise ValueError(f"no feasible tile size for h={h} w={w} c={c_total}")


def _pick_pack(bsz, p_img, c_total, c_in, growth, itemsize, with_td):
    """Largest power-of-two divisor of the batch whose packed VMEM
    footprint fits the budget (images-per-grid-step for the packed
    kernel); 0 if even a single image does not fit."""
    def fits(k):
        p = k * p_img
        f_b = _ceil(c_total, 8) * p * itemsize
        # tap buffer carries 2 guard regions (<= 2*256 lanes) of zeros
        g_b = _ceil(max(9 * growth, 8), 8) * (p + 512) * 4
        x_b = _ceil(c_in, 8) * p * itemsize
        tmp = LANE * p * (itemsize + 4)
        td_b = LANE * p * itemsize if with_td else 0
        return f_b + g_b + x_b + tmp + td_b <= _PACK_BUDGET

    if not fits(1):
        return 0
    ips = 1
    while bsz % (ips * 2) == 0 and fits(ips * 2):
        ips *= 2
    return ips


def _lane_chunks(P, guard):
    """Lane-axis chunking for the pipelined packed kernel: widths are
    LANE multiples and >= guard (a tap's guard-wide read then spills
    only into adjacent chunks); ~8 chunks when P affords them, one
    otherwise."""
    tgt = max(guard, _ceil(-(-P // 8), LANE))
    chunks, lo = [], 0
    while lo < P:
        wd = min(tgt, P - lo)
        if 0 < P - lo - wd < guard:
            wd = P - lo   # merge a sub-guard tail into the last chunk
        chunks.append((lo, wd))
        lo += wd
    return chunks


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _packed_block_kernel(*refs, n_layers, growth, seg_chans, c_lo, w, h,
                         p_img, p_seg, p_out, ips, dtype, temp=None,
                         with_td=False, ablate=None):
    """Whole-image variant: each grid step processes ``ips`` complete
    images packed along the lane axis, one image per ``p_img``-lane slot.

    The slot gap (``p_img - h*w >= w + 1`` lanes) doubles as the conv
    halo: every 3x3 tap roll lands out-of-image reads in a gap whose A
    columns are masked to zero, so no inter-image masking is needed and
    the result is bit-identical to the per-image kernel.  Packing exists
    purely to amortize per-grid-step overhead (mask setup, small GEMM
    dispatch, DMA latency) across images — the dominant cost at the deep
    levels, where one 15x20 image is 300 px against a 128-lane vector
    unit (measured in artifacts/serve_bench/serve_breakdown_67_b256.log).
    """
    n_seg = len(seg_chans)
    seg_hbm = refs[:n_seg]
    scale_ref, shift_ref, wf_ref, bias_ref = refs[n_seg:n_seg + 4]
    idx = n_seg + 4
    wct_ref = cb_ref = None
    if temp is not None:
        wct_ref, cb_ref = refs[idx:idx + 2]
        idx += 2
    td_sc_ref = td_sh_ref = td_wt_ref = td_b_ref = td_hbm = None
    if with_td:
        td_sc_ref, td_sh_ref, td_wt_ref, td_b_ref = refs[idx:idx + 4]
        idx += 4
    out_hbm = refs[idx]
    idx += 1
    if with_td:
        td_hbm = refs[idx]
        idx += 1
    f_ref, g_ref, x_ref = refs[idx:idx + 3]
    idx += 3
    td_ref = None
    if with_td:
        td_ref = refs[idx]
        idx += 1
    sems = refs[idx]

    b = pl.program_id(0)
    nb = pl.num_programs(0)
    g = growth
    n = n_layers
    c_in = sum(seg_chans)
    c_total = c_in + n * g
    hw = h * w
    P = ips * p_img

    # --- DMA pipeline: per-image slot copies, double-buffered ------------
    def _copies(bb):
        cps = []
        for k in range(ips):
            off = 0
            for i in range(n_seg):
                cps.append(pltpu.make_async_copy(
                    seg_hbm[i].at[bb * ips + k, :, :],
                    x_ref.at[off:off + seg_chans[i],
                             k * p_img:k * p_img + p_seg],
                    sems.at[0]))
                off += seg_chans[i]
        return cps

    guard = _ceil(w + 2, LANE)

    @pl.when(b == 0)
    def _():
        if p_img > p_seg:
            # slot-gap lanes are never DMA'd; zero once (persists)
            for k in range(ips):
                x_ref[0:c_in, k * p_img + p_seg:(k + 1) * p_img] = (
                    jnp.zeros((c_in, p_img - p_seg), dtype))
        # tap-buffer guard lanes: permanently zero, so chunked tap
        # reductions read out-of-image zeros instead of wrapping (the
        # lanes the old %P wrap reached were slot-gap zeros too)
        nr = g_ref.shape[0]
        g_ref[0:nr, 0:guard] = jnp.zeros((nr, guard), jnp.float32)
        g_ref[0:nr, guard + P:guard + P + guard] = (
            jnp.zeros((nr, guard), jnp.float32))
        for c in _copies(b):
            c.start()

    for c in _copies(b):
        c.wait()
    f_ref[0:c_in, :] = x_ref[0:c_in, :]

    @pl.when(b < nb - 1)
    def _():
        for c in _copies(b + 1):
            c.start()

    # --- masks over the slot-local pixel index ---------------------------
    pid = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    img = jax.lax.div(pid, p_img)
    local = pid - img * p_img
    row = jax.lax.div(local, w)
    col = local - row * w
    mask_v = (local < hw).astype(jnp.float32)
    mask_l = mask_v * (col != 0)
    mask_r = mask_v * (col != (w - 1))

    # --- dense layers (identical math to _dense_block_kernel), software-
    # pipelined along the lane (pixel) axis: each layer's GEMM and the
    # 9-tap VPU reduction are split into lane chunks, and the reduction
    # of chunk c is issued between the GEMMs of chunks c+2, c+3, ... —
    # the reduction has no data dependency on them, so the MXU (GEMM)
    # and VPU (rolls/masks/adds) overlap instead of serializing per
    # layer.  The K loop is untouched (chunking K would add MXU passes).
    chunks = _lane_chunks(P, guard)
    C = len(chunks)

    def gemm_chunk(j, c_j, lo, wd):
        # one g_ref write per chunk; K-partials accumulate as values
        gacc = None
        for kc in range(0, c_j, LANE):
            ck = min(LANE, c_j - kc)
            blk = f_ref[kc:kc + ck, lo:lo + wd].astype(jnp.float32)
            if ablate == "no_prep":
                # DIAGNOSTIC ONLY (cli/serve_breakdown --ablate): skip the
                # per-layer BN/ReLU/mask feed — wrong math, right timing;
                # the delta vs the real kernel is the feed's VPU cost
                a = blk.astype(dtype)
            else:
                sc = scale_ref[kc:kc + ck, j:j + 1]
                sh = shift_ref[kc:kc + ck, j:j + 1]
                a = (jnp.maximum(blk * sc + sh, 0.0)
                     * mask_v[:, lo:lo + wd]).astype(dtype)
            part = jnp.dot(wf_ref[j, :, kc:kc + ck], a,
                           preferred_element_type=jnp.float32)
            gacc = part if gacc is None else gacc + part
        g_ref[:, guard + lo:guard + lo + wd] = gacc

    def tap_chunk_ablated(j, c_j, lo, wd):
        # DIAGNOSTIC ONLY: one tap, no rolls/masks/adds — the delta vs
        # the real 9-tap reduction is the tap chain's VPU cost
        y = g_ref[4 * g:5 * g, lo:lo + wd] + bias_ref[j, :][:, None]
        f_ref[c_j:c_j + g, lo:lo + wd] = y.astype(dtype)

    def tap_chunk(j, c_j, lo, wd):
        if ablate == "no_taps":
            return tap_chunk_ablated(j, c_j, lo, wd)
        # wide read [lo - guard, lo + wd + guard) in global lanes —
        # always in-bounds of the guarded buffer; rolls ≤ w+1 never
        # wrap within it, and rolled-in guard/gap lanes are zero
        wide = wd + 2 * guard
        acc = None
        for ky in range(3):
            for kx in range(3):
                tap = ky * 3 + kx
                gs = g_ref[tap * g:(tap + 1) * g, lo:lo + wide]
                roll = (ky - 1) * w + (kx - 1)
                if roll != 0:
                    gs = pltpu.roll(gs, shift=(-roll) % wide, axis=1)
                gs = gs[:, guard:guard + wd]
                if kx == 0:
                    gs = gs * mask_l[:, lo:lo + wd]
                elif kx == 2:
                    gs = gs * mask_r[:, lo:lo + wd]
                acc = gs if acc is None else acc + gs
        y = acc + bias_ref[j, :][:, None]
        f_ref[c_j:c_j + g, lo:lo + wd] = y.astype(dtype)

    # gemm issue order (j, chunk); taps trail two issues behind.  The
    # cross-layer lag is safe because layer j's gemm on chunk c reads
    # y_{j-1} rows only at chunk c, whose tap ran two issues after
    # gemm(j-1, c) — i.e. C-2 issues ago (C >= 5 also keeps the trailing
    # taps' g_ref chunks disjoint from the next layer's first writes;
    # smaller C drains taps at each layer boundary instead).
    if C >= 5:
        # global stream, taps 2 issues behind: tap(j, c) needs
        # gemm(j, c+1) (guard-wide read), ran 1 issue earlier; gemm(j, c)
        # needs tap(j-1, c), ran C-2 issues earlier; the <=2 chunks a new
        # layer overwrites before the old layer's last taps drain are
        # disjoint from the >=C-3 chunks those taps read
        order = [(j, ci) for j in range(n) for ci in range(C)]
        done = 0
        for t, (j, ci) in enumerate(order):
            gemm_chunk(j, c_in + j * g, *chunks[ci])
            if done <= t - 2:
                jp, cp = order[done]
                tap_chunk(jp, c_in + jp * g, *chunks[cp])
                done += 1
        while done < len(order):
            jp, cp = order[done]
            tap_chunk(jp, c_in + jp * g, *chunks[cp])
            done += 1
    else:
        # too few chunks to pipeline safely: all GEMMs, then all taps
        for j in range(n):
            for ci in range(C):
                gemm_chunk(j, c_in + j * g, *chunks[ci])
            for ci in range(C):
                tap_chunk(j, c_in + j * g, *chunks[ci])

    if temp is None:
        outs = [pltpu.make_async_copy(
            f_ref.at[c_lo:c_total, k * p_img:k * p_img + p_out],
            out_hbm.at[b * ips + k, :, :], sems.at[3])
            for k in range(ips)]
        for o in outs:
            o.start()
        if not with_td:
            for o in outs:
                o.wait()
            return
        # --- fused TransitionDown (pre-pool): BN -> ReLU -> 1x1 conv ----
        prev = []
        for mc in range(0, c_total, LANE):
            cm_ = min(LANE, c_total - mc)
            u = None
            for kc in range(0, c_total, LANE):
                ck = min(LANE, c_total - kc)
                blk = f_ref[kc:kc + ck, :].astype(jnp.float32)
                a = (jnp.maximum(blk * td_sc_ref[kc:kc + ck, :]
                                 + td_sh_ref[kc:kc + ck, :], 0.0)
                     * mask_v).astype(dtype)
                part = jnp.dot(td_wt_ref[mc:mc + cm_, kc:kc + ck], a,
                               preferred_element_type=jnp.float32)
                u = part if u is None else u + part
            for c in prev:
                c.wait()
            td_ref[0:cm_, :] = (u.astype(dtype)
                                + td_b_ref[mc:mc + cm_, :].astype(dtype))
            prev = [pltpu.make_async_copy(
                td_ref.at[0:cm_, k * p_img:k * p_img + p_out],
                td_hbm.at[b * ips + k, pl.ds(mc, cm_), :], sems.at[2])
                for k in range(ips)]
            for c in prev:
                c.start()
        for c in prev:
            c.wait()
        for o in outs:
            o.wait()
        return

    # --- fused classifier tail: L2 norm -> 1x1 conv -> /T ----------------
    feats = f_ref[0:c_total, :].astype(jnp.float32)
    norm2 = jnp.sum(feats * feats, axis=0, keepdims=True)
    inv = 1.0 / jnp.maximum(jnp.sqrt(norm2), 1e-12)
    fn = (feats * inv).astype(dtype)
    u = jnp.dot(wct_ref[:, :], fn, preferred_element_type=jnp.float32)
    g_ref[0:8, guard:guard + P] = (u + cb_ref[:, :]) * (1.0 / temp)
    outs = [pltpu.make_async_copy(
        g_ref.at[0:8, guard + k * p_img:guard + k * p_img + p_out],
        out_hbm.at[b * ips + k, :, :], sems.at[3]) for k in range(ips)]
    for o in outs:
        o.start()
    for o in outs:
        o.wait()


def _dense_block_kernel(*refs, n_layers, growth, seg_chans, c_lo, w, h,
                        tile_rows, n_tiles, align, dtype, temp=None,
                        with_td=False):
    n_seg = len(seg_chans)
    seg_hbm = refs[:n_seg]
    scale_ref, shift_ref, wf_ref, bias_ref = refs[n_seg:n_seg + 4]
    idx = n_seg + 4
    wct_ref = cb_ref = None
    if temp is not None:
        wct_ref, cb_ref = refs[idx:idx + 2]
        idx += 2
    td_sc_ref = td_sh_ref = td_wt_ref = td_b_ref = td_hbm = None
    if with_td:
        td_sc_ref, td_sh_ref, td_wt_ref, td_b_ref = refs[idx:idx + 4]
        idx += 4
    out_hbm = refs[idx]
    idx += 1
    if with_td:
        td_hbm = refs[idx]
        idx += 1
    f_ref, g_ref, x_ref = refs[idx:idx + 3]
    idx += 3
    td_ref = None
    if with_td:
        td_ref = refs[idx]
        idx += 1
    sems = refs[idx]

    b = pl.program_id(0)
    t = pl.program_id(1)
    nt = pl.num_programs(1)
    g = growth
    n = n_layers
    c_in = sum(seg_chans)
    c_total = c_in + n * g
    trw = _ceil(tile_rows * w, align) if n_tiles == 1 else tile_rows * w
    nwd = _ceil(n * w, align)
    p_full = trw + 2 * nwd

    # --- DMA pipeline -----------------------------------------------------
    # circular pixel layout along lanes: [center trw | bottom nwd | top nwd]
    # (halo reads round up to 128 px; the slop occupies circular positions
    # that are already outside the valid shrink region).  The CENTER copy
    # (the bulk of the input) is double-buffered through x_ref: each step
    # prefetches the NEXT grid step's center while this step computes, and
    # only pays a VMEM->VMEM pass to move the staged input into F.  Halo
    # copies are small and stay synchronous.  The out-DMA is awaited at
    # the START of the next step (it reads F, which the x_ref->F move
    # would otherwise clobber).
    nb = pl.num_programs(0)
    first = jnp.logical_and(b == 0, t == 0)
    is_last = jnp.logical_and(b == nb - 1, t == nt - 1)
    t_nx = jax.lax.rem(t + 1, nt)
    b_nx = b + jax.lax.div(t + 1, nt)
    c0 = pl.multiple_of(t * trw, align)
    b0 = pl.multiple_of(t * trw + trw, align)
    t0 = pl.multiple_of(t * trw - nwd, align)
    c0_nx = pl.multiple_of(t_nx * trw, align)

    def _center(bb, px, i, off):
        return pltpu.make_async_copy(
            seg_hbm[i].at[bb, :, pl.ds(px, trw)],
            x_ref.at[off:off + seg_chans[i], :], sems.at[0])

    @pl.when(first)
    def _():
        off = 0
        for i in range(n_seg):
            _center(b, c0, i, off).start()
            off += seg_chans[i]

    # the first step's own copy, or the previous step's prefetch
    off = 0
    for i in range(n_seg):
        _center(b, c0, i, off).wait()
        off += seg_chans[i]
    f_ref[0:c_in, 0:trw] = x_ref[0:c_in, :]

    @pl.when(jnp.logical_not(is_last))
    def _():
        off = 0
        for i in range(n_seg):
            _center(b_nx, c0_nx, i, off).start()
            off += seg_chans[i]

    if n_tiles > 1:
        # single-tile grids never run halo DMAs; emitting them anyway
        # would trip Mosaic's static bounds checks
        off = 0
        for i in range(n_seg):
            c_seg = seg_chans[i]
            bottom = pltpu.make_async_copy(
                seg_hbm[i].at[b, :, pl.ds(b0, nwd)],
                f_ref.at[off:off + c_seg, trw:trw + nwd], sems.at[1])
            top = pltpu.make_async_copy(
                seg_hbm[i].at[b, :, pl.ds(t0, nwd)],
                f_ref.at[off:off + c_seg, trw + nwd:p_full], sems.at[2])

            @pl.when(t < nt - 1)
            def _():
                bottom.start()

            @pl.when(t > 0)
            def _():
                top.start()

            @pl.when(t < nt - 1)
            def _():
                bottom.wait()

            @pl.when(t > 0)
            def _():
                top.wait()
            off += c_seg

    # halo regions whose DMA was skipped hold stale data; zero them so the
    # mask arithmetic below stays finite (NaN * 0 == NaN)
    @pl.when(t == 0)
    def _():
        f_ref[0:c_in, trw + nwd:p_full] = jnp.zeros((c_in, nwd), dtype)

    @pl.when(t == nt - 1)
    def _():
        f_ref[0:c_in, trw:trw + nwd] = jnp.zeros((c_in, nwd), dtype)

    # --- masks over the global pixel index -------------------------------
    pid = jax.lax.broadcasted_iota(jnp.int32, (1, p_full), 1)
    gpx = jnp.where(pid < trw + nwd, t * trw + pid,
                    t * trw + pid - trw - 2 * nwd)
    grow = jax.lax.div(gpx, w)  # trunc division; gpx<0 only on halo slop
    gcol = gpx - grow * w
    mask_v = ((gpx >= 0) & (grow < h)).astype(jnp.float32)
    mask_l = mask_v * (gcol != 0)
    mask_r = mask_v * (gcol != (w - 1))

    # --- dense layers -----------------------------------------------------
    for j in range(n):
        c_j = c_in + j * g
        # kn2row GEMM over K chunks: G = Wf_j @ bn_relu(F[:c_j, :])
        for kc in range(0, c_j, LANE):
            ck = min(LANE, c_j - kc)
            blk = f_ref[kc:kc + ck, :].astype(jnp.float32)
            sc = scale_ref[kc:kc + ck, j:j + 1]
            sh = shift_ref[kc:kc + ck, j:j + 1]
            a = (jnp.maximum(blk * sc + sh, 0.0) * mask_v).astype(dtype)
            part = jnp.dot(wf_ref[j, :, kc:kc + ck], a,
                           preferred_element_type=jnp.float32)
            if kc == 0:
                g_ref[:, :] = part
            else:
                g_ref[:, :] = g_ref[:, :] + part
        # shift-add the 9 taps: y[p] = sum_t G[tap t, (p + off_t) mod P]
        acc = None
        for ky in range(3):
            for kx in range(3):
                tap = ky * 3 + kx
                gs = g_ref[tap * g:(tap + 1) * g, :]
                roll = (ky - 1) * w + (kx - 1)
                if roll != 0:
                    gs = pltpu.roll(gs, shift=(-roll) % p_full, axis=1)
                if kx == 0:
                    gs = gs * mask_l
                elif kx == 2:
                    gs = gs * mask_r
                acc = gs if acc is None else acc + gs
        y = acc + bias_ref[j, :][:, None]
        f_ref[c_j:c_j + g, :] = y.astype(dtype)

    if temp is None:
        copy_out = pltpu.make_async_copy(
            f_ref.at[c_lo:c_total, 0:trw],
            out_hbm.at[b, :, pl.ds(c0, trw)], sems.at[3])
        copy_out.start()
        if not with_td:
            copy_out.wait()
            return
        # --- fused TransitionDown (pre-pool): BN -> ReLU -> 1x1 conv ----
        # (reference layers.py:46-57; the 2x2 maxpool runs in XLA where
        # the [B, C, H, W] window reduction is natural).  The M dimension
        # is chunked so the f32 product reuses the G scratch rows.
        for mc in range(0, c_total, LANE):
            cm_ = min(LANE, c_total - mc)
            u = None
            for kc in range(0, c_total, LANE):
                ck = min(LANE, c_total - kc)
                blk = f_ref[kc:kc + ck, :].astype(jnp.float32)
                a = (jnp.maximum(blk * td_sc_ref[kc:kc + ck, :]
                                 + td_sh_ref[kc:kc + ck, :], 0.0)
                     * mask_v).astype(dtype)
                part = jnp.dot(td_wt_ref[mc:mc + cm_, kc:kc + ck], a,
                               preferred_element_type=jnp.float32)
                u = part if u is None else u + part
            # flax rounding order: conv f32-accum -> cast -> add bias
            td_ref[0:cm_, :] = (u.astype(dtype)
                                + td_b_ref[mc:mc + cm_, :].astype(dtype))
            td_copy = pltpu.make_async_copy(
                td_ref.at[0:cm_, 0:trw],
                td_hbm.at[b, pl.ds(mc, cm_), pl.ds(c0, trw)], sems.at[2])
            td_copy.start()
            td_copy.wait()
        copy_out.wait()
        return

    # --- fused classifier tail: L2 norm -> 1x1 conv -> /T ----------------
    # (reference tiramisu.py:105,113-125; rounding order matches flax:
    # normalize in f32, cast, conv with f32 accumulation, add bias, /T)
    feats = f_ref[0:c_total, :].astype(jnp.float32)
    norm2 = jnp.sum(feats * feats, axis=0, keepdims=True)
    inv = 1.0 / jnp.maximum(jnp.sqrt(norm2), 1e-12)
    fn = (feats * inv).astype(dtype)
    u = jnp.dot(wct_ref[:, :], fn, preferred_element_type=jnp.float32)
    g_ref[0:8, :] = (u + cb_ref[:, :]) * (1.0 / temp)
    copy_out = pltpu.make_async_copy(
        g_ref.at[0:8, 0:trw], out_hbm.at[b, :, pl.ds(c0, trw)], sems.at[3])
    copy_out.start()
    copy_out.wait()


def fused_dense_block_cm(segments, folded, *, n_layers, growth, c_lo, h, w,
                         tile_rows=None, interpret=False, classifier=None,
                         transition=None, ablate=None):
    """Run one DenseBlock (inference) as a fused Pallas kernel,
    channel-major.

    segments: list of [B, C_i, Ppad] tensors (Ppad = H*W padded to a
    multiple of 128 — see :func:`_to_cm`) forming the virtual concat.
    folded: output of :func:`_fold_block_params`.
    c_lo: first output channel — 0 returns the full concat
    [input || y_1..y_n]; c_in returns only the new features (the
    reference DenseBlock ``upsample`` variant, layers.py:34-44).
    classifier: optional (wcT [8, c_total], cbias [8, 1], temperature) —
    fuses the network tail (per-pixel L2 norm -> 1x1 conv -> /T) into the
    kernel epilogue and returns f32 logits [B, 8, Ppad] instead of
    features (rows beyond n_classes are padding).  Saves the full-width
    feature write-out AND the layout copies XLA otherwise spends
    transposing the [B, C, P] concat for the classifier GEMM (~20% of
    whole-net time at 160x120, measured).
    Returns [B, c_total - c_lo, Ppad] (or the logits tensor).
    """
    align = 1 if interpret else LANE
    scale, shift, wf, bias = folded
    seg_chans = tuple(x.shape[1] for x in segments)
    bsz = segments[0].shape[0]
    p_pad = segments[0].shape[2]
    dtype = segments[0].dtype
    itemsize = jnp.dtype(dtype).itemsize
    c_in = sum(seg_chans)
    c_total = c_in + n_layers * growth

    extra_in = list(folded)
    temp = None
    if classifier is not None:
        wct, cbias, temp = classifier
        extra_in += [wct.astype(dtype), cbias.astype(jnp.float32)]
        out_shape = jax.ShapeDtypeStruct((bsz, 8, p_pad), jnp.float32)
    else:
        out_shape = jax.ShapeDtypeStruct((bsz, c_total - c_lo, p_pad),
                                         dtype)
    if transition is not None:
        td_sc, td_sh, td_wt, td_b = transition
        extra_in += [td_sc.astype(jnp.float32), td_sh.astype(jnp.float32),
                     td_wt.astype(dtype), td_b.astype(jnp.float32)]
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((bsz, c_total, p_pad), dtype))

    common = dict(
        out_specs=(pl.BlockSpec(memory_space=pl.ANY)
                   if transition is None else
                   (pl.BlockSpec(memory_space=pl.ANY),) * 2),
        out_shape=out_shape,
        # v5e has 128 MiB VMEM; the default 16 MiB scoped cap is too small
        # for the unrolled per-layer GEMM temporaries
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    # whole-image packed path: slot gap >= w+1 makes the image
    # self-haloed; pack as many images per grid step as VMEM affords
    p_img = _ceil(h * w + w + 1, align)
    ips = _pick_pack(bsz, p_img, c_total, c_in, growth, itemsize,
                     transition is not None)
    if ips > 0 and (tile_rows is None or tile_rows == h):
        P = ips * p_img
        kernel = functools.partial(
            _packed_block_kernel, n_layers=n_layers, growth=growth,
            seg_chans=seg_chans, c_lo=c_lo, w=w, h=h, p_img=p_img,
            p_seg=p_pad, p_out=p_pad, ips=ips, dtype=dtype, temp=temp,
            with_td=transition is not None, ablate=ablate)
        return pl.pallas_call(
            kernel,
            grid=(bsz // ips,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * len(segments) + [
                pl.BlockSpec(memory_space=pltpu.VMEM)] * len(extra_in),
            scratch_shapes=[
                pltpu.VMEM((c_total, P), dtype),
                # + 2*guard zero lanes for the chunked tap reductions
                pltpu.VMEM((max(9 * growth, 8),
                            P + 2 * _ceil(w + 2, LANE)), jnp.float32),
                pltpu.VMEM((c_in, P), dtype),
            ] + ([pltpu.VMEM((LANE, P), dtype)]
                 if transition is not None else []) + [
                pltpu.SemaphoreType.DMA((4,)),
            ],
            **common,
        )(*segments, *extra_in)

    if ablate is not None:
        # not an assert: under python -O an assert is stripped and a
        # tiled-path run would silently return correct math while the
        # caller believes it measured an ablation (ADVICE r04)
        raise ValueError(
            "ablate is a packed-path-only diagnostic; this level fell to "
            "the tiled path (ips=0 or partial-height tiling) — skip "
            "ablation for it")
    if tile_rows is None:
        tile_rows = _pick_tile_rows(h, w, c_total, growth, n_layers,
                                    itemsize, align)
    nt = h // tile_rows
    trw = _ceil(tile_rows * w, align) if nt == 1 else tile_rows * w
    assert trw * nt == p_pad, (trw, nt, p_pad)
    kernel = functools.partial(
        _dense_block_kernel, n_layers=n_layers, growth=growth,
        seg_chans=seg_chans, c_lo=c_lo, w=w, h=h, tile_rows=tile_rows,
        n_tiles=nt, align=align, dtype=dtype, temp=temp,
        with_td=transition is not None)
    p_scr = trw + 2 * _ceil(n_layers * w, align)
    return pl.pallas_call(
        kernel,
        grid=(bsz, nt),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * len(segments) + [
            pl.BlockSpec(memory_space=pltpu.VMEM)] * len(extra_in),
        scratch_shapes=[
            pltpu.VMEM((c_total, p_scr), dtype),
            pltpu.VMEM((max(9 * growth, 8), p_scr), jnp.float32),
            pltpu.VMEM((c_in, trw), dtype),
        ] + ([pltpu.VMEM((LANE, p_scr), dtype)]
             if transition is not None else []) + [
            pltpu.SemaphoreType.DMA((4,)),
        ],
        **common,
    )(*segments, *extra_in)


def fused_dense_block(segments, folded, *, n_layers, growth, c_lo,
                      tile_rows=None, interpret=False):
    """NHWC convenience wrapper around :func:`fused_dense_block_cm`.

    segments: list of (tensor [B, H, W, C_i], real_channels) pairs; any
    trailing channels beyond real_channels are dropped.  Returns
    (out [B, H, W, c_out], c_out).
    """
    b, h, w, _ = segments[0][0].shape
    align = 1 if interpret else LANE
    cm = [_to_cm(x[..., :real], align) for x, real in segments]
    out = fused_dense_block_cm(cm, folded, n_layers=n_layers, growth=growth,
                               c_lo=c_lo, h=h, w=w, tile_rows=tile_rows,
                               interpret=interpret)
    return _from_cm(out, h, w), out.shape[1]


# ---------------------------------------------------------------------------
# channel-major helpers + XLA glue
# ---------------------------------------------------------------------------

def _to_cm(x, align=LANE):
    """[B, H, W, C] -> [B, C, ceil(H*W, align)]."""
    b, h, w, c = x.shape
    x = jnp.transpose(x.reshape(b, h * w, c), (0, 2, 1))
    return jnp.pad(x, ((0, 0), (0, 0), (0, _ceil(h * w, align) - h * w)))


def _from_cm(x, h, w):
    """[B, C, Ppad] -> [B, H, W, C]."""
    return jnp.transpose(x[:, :, :h * w], (0, 2, 1)).reshape(
        x.shape[0], h, w, x.shape[1])


def _bn_relu_cm(x, p, s):
    scale = (p["scale"] * jax.lax.rsqrt(s["var"] + EPS))[:, None]
    shift = (p["bias"] - s["mean"] * scale[:, 0])[:, None]
    return jnp.maximum(x.astype(jnp.float32) * scale + shift, 0.0)


def _fold_transition(p, s):
    """TransitionDown params -> kernel-epilogue form (BN folded, conv
    kernel transposed for the channel-major GEMM)."""
    bn, bs = p["BatchNorm_0"], s["BatchNorm_0"]
    sc = (bn["scale"] * jax.lax.rsqrt(bs["var"] + EPS))
    sh = bn["bias"] - bs["mean"] * sc
    return (sc[:, None], sh[:, None], p["Conv_0"]["kernel"][0, 0].T,
            p["Conv_0"]["bias"][:, None])


def _pool2_cm(x, h, w, align=LANE):
    """2x2 maxpool (floor) on a channel-major [B, C, Ppad] tensor."""
    bsz = x.shape[0]
    y = x[:, :, :h * w].reshape(bsz, -1, h, w)
    y = jax.lax.reduce_window(
        y, jnp.array(-jnp.inf, y.dtype), jax.lax.max,
        (1, 1, 2, 2), (1, 1, 2, 2), "VALID")
    ho, wo = h // 2, w // 2
    y = y.reshape(bsz, -1, ho * wo)
    return jnp.pad(y, ((0, 0), (0, 0), (0, _ceil(ho * wo, align) - ho * wo)))


def _transition_up_cm(x, h, w, skip_h, skip_w, p, dtype, align=LANE):
    """stride-2 VALID 3x3 transposed conv -> center-crop, channel-major."""
    bsz = x.shape[0]
    x4 = x[:, :, :h * w].reshape(bsz, -1, h, w)
    y = jax.lax.conv_transpose(
        x4.astype(dtype), p["kernel"].astype(dtype), (2, 2), "VALID",
        dimension_numbers=("NCHW", "HWIO", "NCHW"))
    y = y + p["bias"].astype(dtype)[:, None, None]
    y0 = (y.shape[2] - skip_h) // 2
    x0 = (y.shape[3] - skip_w) // 2
    y = y[:, :, y0:y0 + skip_h, x0:x0 + skip_w]
    y = y.reshape(bsz, -1, skip_h * skip_w)
    return jnp.pad(y, ((0, 0), (0, 0),
                       (0, _ceil(skip_h * skip_w, align) - skip_h * skip_w)))


def _fold(fe_p, fe_s, name, n_layers, growth, dtype):
    k_max = fe_p[name][f"DenseLayer_{n_layers - 1}"]["BatchNorm_0"][
        "scale"].shape[0]
    return _fold_block_params(fe_p[name], fe_s[name], n_layers, growth,
                              k_max, dtype)


def pallas_apply(model, variables, x, *, use_softmax: bool = True,
                 interpret: bool | None = None):
    """Inference forward of an ``FCDenseNet`` with fused dense blocks.

    Matches ``model.apply(variables, x, train=False, use_softmax=...)``
    (parity-gated).  ``interpret`` defaults to True off-TPU so the same
    code path runs under the CPU test mesh.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    align = 1 if interpret else LANE
    dtype = model.policy.compute_dtype
    g = model.growth_rate
    fe_p = variables["params"]["featureExtractor"]
    fe_s = variables["batch_stats"]["featureExtractor"]
    bsz, h, w, _ = x.shape

    cur = jax.lax.conv_general_dilated(
        x.astype(dtype), fe_p["firstconv"]["kernel"].astype(dtype), (1, 1),
        ((1, 1), (1, 1)), dimension_numbers=DN)
    cur = _to_cm(cur + fe_p["firstconv"]["bias"].astype(dtype), align)

    dims = [(h, w)]
    skips = []
    for i, n in enumerate(model.down_blocks):
        hh, ww = dims[-1]
        folded = _fold(fe_p, fe_s, f"denseDown{i}", n, g, dtype)
        td = _fold_transition(fe_p[f"transDown{i}"], fe_s[f"transDown{i}"])
        cur, td_pre = fused_dense_block_cm(
            [cur], folded, n_layers=n, growth=g, c_lo=0, h=hh, w=ww,
            interpret=interpret, transition=td)
        skips.append(cur)
        cur = _pool2_cm(td_pre, hh, ww, align)
        dims.append((hh // 2, ww // 2))

    hh, ww = dims[-1]
    folded = _fold(fe_p, fe_s, "bottleneck", model.bottleneck_layers, g,
                   dtype)
    new = fused_dense_block_cm([cur], folded,
                               n_layers=model.bottleneck_layers, growth=g,
                               c_lo=cur.shape[1], h=hh, w=ww,
                               interpret=interpret)

    cl_p = variables["params"]["classifier"]["finalConv"]
    n_cls = cl_p["kernel"].shape[-1]
    for i, n in enumerate(model.up_blocks):
        skip = skips.pop()
        sh, sw = dims[-2 - i]
        up = _transition_up_cm(new, hh, ww, sh, sw,
                               fe_p[f"transUp{i}"]["ConvTranspose_0"],
                               dtype, align)
        hh, ww = sh, sw
        last = i == len(model.up_blocks) - 1
        folded = _fold(fe_p, fe_s, f"denseUp{i}", n, g, dtype)
        classifier = None
        if last and model.kernel_size == 1 and n_cls <= 8:
            # fuse L2-norm + 1x1 classifier + temperature into the kernel
            wct = jnp.pad(cl_p["kernel"][0, 0].T, ((0, 8 - n_cls), (0, 0)))
            cbias = jnp.pad(cl_p["bias"], (0, 8 - n_cls))[:, None]
            classifier = (wct, cbias, 0.05)
        new = fused_dense_block_cm(
            [up, skip], folded, n_layers=n, growth=g,
            c_lo=0 if last else up.shape[1] + skip.shape[1],
            h=hh, w=ww, interpret=interpret, classifier=classifier)

    if classifier is not None:
        logits = _from_cm(new, h, w)[..., :n_cls]
    else:
        # wide classifier kernels fall back to the XLA tail
        feats = new.astype(jnp.float32)
        norm = jnp.maximum(
            jnp.sqrt(jnp.sum(feats * feats, axis=1, keepdims=True)), 1e-12)
        pad = model.kernel_size // 2
        nf = _from_cm((feats / norm).astype(dtype), h, w)
        logits = jax.lax.conv_general_dilated(
            nf, cl_p["kernel"].astype(dtype), (1, 1),
            ((pad, pad), (pad, pad)), dimension_numbers=DN)
        logits = logits.astype(jnp.float32) + cl_p["bias"]
        logits = logits / 0.05  # classifier temperature (T=0.05)

    if use_softmax:
        logits = jax.nn.softmax(logits, axis=-1)
    return logits
