"""Fused int8 Pallas body kernel for LaneNetLite — experimental.

Motivation: the serving profile (models/lanenet_lite.serve_apply) shows
the bf16 body at ~65% MXU — near the ceiling set by the 64/96-channel
widths — leaving the v5e's 2x int8 MXU rate as the remaining compute
lever.  This kernel runs the ENTIRE residual body + 1x1 head per frame
inside one Pallas program with all activations VMEM-resident:

- row-major [pixels, channels] layout at the /4 feature resolution
  (30x40 = 1200 px -> 1216 sublanes): the natural reshape of the NHWC
  stem output, so nothing is transposed on either side of the kernel;
- each 3x3 (optionally dilated) conv builds its im2row operand as a
  lane-concat of the 9 tap-shifted int8 views (static ``jnp.roll``
  along sublanes — Mosaic has no dynamic_rotate lowering for int8 —
  plus a border select to the zero-point code, reproducing the XLA
  path's exact -zp padding) and runs ONE int8 x int8 -> int32 MXU GEMM
  [1216, 9*Cin] @ [9*Cin, Cout];
- dequant/bias/relu/requant epilogues replicate
  ``lanenet_int8._conv_i8``/``_quant`` op-for-op, so outputs are
  BIT-EXACT vs the XLA int8 path (verified on TPU: max logit diff 0.0;
  gated in tests/test_lanenet_pallas.py in interpret mode).

MEASURED OUTCOME (TPU v5e, honest on-device scan harness — see
QUIRKS.md "benchmarking through the dev relay"): the fused body runs
~7.2 ms/256 frames vs ~2.8 ms for XLA's bf16 body and ~3.1 ms for
XLA's int8 graph.  Two structural costs dominate: (a) the im2row
tap-build + requant chains are VPU passes that Mosaic executes in
sequence with the MXU GEMMs (no producer pipelining like XLA's fused
conv epilogues), and (b) a per-grid-step overhead of ~10 us/frame-step
(copy-only kernel floor ~2.6 ms/256) that batching frames per step
(``ft``) did not recover.  CONCLUSION: XLA's conv lowering wins for
these shapes; the serving default remains bf16 ``serve_apply``
(~62-65k fps/chip), with this kernel kept as a correct, parity-gated
alternative (``BENCH_MODEL=lanenet_int8_pallas``, ``s2r-serve --int8
--fused``) and as the worked example of the kernel-authoring
methodology.

The stem's two strided convs stay in XLA (reusing the int8 sites via
``lanenet_int8._conv_i8``); the x4 bilinear upsample + argmax tail runs
channel-first in XLA (the serve_apply tail).

Reference role: the serving model replacing per-frame batch-1 inference
(rightLaneNetwork/makeDemoVideo.py:15-47); quantization scheme in
models/lanenet_int8.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .lanenet_int8 import QuantizedLaneNet, _conv_i8, _graph, _quant

SUB = 32          # int8 sublane quantum
LANE = 128


def _ceil(x: int, m: int) -> int:
    return -(-x // m) * m


# ---------------------------------------------------------------------------
# parameter packing
# ---------------------------------------------------------------------------

class _ConvSpec:
    """Static per-conv metadata + packed operands for the kernel."""

    def __init__(self, name, site, kind):
        self.name = name
        self.kind = kind                      # "conv3" | "conv1"
        k = np.asarray(site["w_q"])           # [kh, kw, Cin, Cout]
        kh, kw, cin, cout = k.shape
        self.cin, self.cout = int(cin), int(cout)
        self.dilation = int(site["dilation"])
        self.relu = bool(site["relu"])
        self.zp = int(site["zp"])
        self.act_scale = float(site["act_scale"])
        if kind == "conv3":
            # tap-major rows: row tap*Cin + ci  <->  A9 lane tap*Cin + ci
            wq = k.transpose(0, 1, 2, 3).reshape(kh * kw * cin, cout)
        else:
            wq = k.reshape(cin, cout)
        self.wq = jnp.asarray(wq, jnp.int8)
        # f32 epilogue vectors, [1, Cout] — identical factors to _conv_i8
        deq = np.asarray(site["act_scale"], np.float32) * \
            np.asarray(site["w_scale"], np.float32)
        self.deq = jnp.asarray(deq, jnp.float32)[None, :]
        self.zpsum = jnp.asarray(
            self.zp * np.asarray(site["w_colsum"], np.float32),
            jnp.float32)[None, :]
        self.bias = jnp.asarray(site["bias"], jnp.float32)[None, :]


def _pack(qn: QuantizedLaneNet):
    """Ordered body conv specs (conv1, conv2[, short]) per ResBlock."""
    blocks = []
    for name, _dil in _graph(qn.model)[1]:
        specs = [
            _ConvSpec(name + "/conv1", qn.sites[name + "/conv1"], "conv3"),
            _ConvSpec(name + "/conv2", qn.sites[name + "/conv2"], "conv3"),
        ]
        if name + "/short" in qn.sites:
            specs.append(_ConvSpec(name + "/short",
                                   qn.sites[name + "/short"], "conv1"))
        blocks.append(specs)
    return blocks


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------

def _body_kernel(*refs, blocks, h, w, p_pad, c_stem, n_cls_pad, ft,
                 interpret):
    """One grid step = ``ft`` frames stacked along sublanes.

    refs: x_ref [ft*p_pad, c_stem] f32, per-conv (wq, deq, zpsum, bias)
    ..., head_w [c_last, n_cls_pad] f32, head_b [1, n_cls_pad] f32,
    out_ref [ft*p_pad, n_cls_pad] f32.
    """
    x3_ref = refs[0]
    idx = 1
    conv_refs = []
    for specs in blocks:
        for _ in specs:
            conv_refs.append(refs[idx:idx + 4])
            idx += 4
    head_w, head_b = refs[idx:idx + 2]
    out3_ref = refs[idx + 2]

    n_px = ft * p_pad
    # frame-local row/col of every sublane position (pad rows land on
    # r == h and are masked out of every tap read below)
    pid = jax.lax.broadcasted_iota(jnp.int32, (n_px, 1), 0) % p_pad
    row = pid // w
    col = pid - row * w

    def taps_matmul(spec, q_src_slice):
        """sum_t shifted(q)[*, tap t] @ Wq — via one lane-concat + GEMM."""
        d = spec.dilation
        cin = spec.cin
        parts = []
        for ky in (-1, 0, 1):
            for kx in (-1, 0, 1):
                off = (ky * w + kx) * d
                qs = q_src_slice
                if off != 0:
                    # static sublane rotate: Mosaic has no dynamic_rotate
                    # lowering for int8, but static jnp.roll lowers fine
                    qs = jnp.roll(qs, (-off) % n_px, axis=0)
                valid = ((row + ky * d >= 0) & (row + ky * d < h)
                         & (col + kx * d >= 0) & (col + kx * d < w))
                qs = jnp.where(valid, qs,
                               jnp.full_like(qs, np.int8(-spec.zp)))
                parts.append(qs)
        a9 = jnp.concatenate(parts, axis=1)          # [n_px, 9*cin] int8
        return a9

    def epilogue(acc_i32, spec, wq_ref_unused, deq_ref, zpsum_ref, bias_ref):
        # identical op sequence to lanenet_int8._conv_i8
        y = (acc_i32.astype(jnp.float32) + zpsum_ref[:, :]) \
            * deq_ref[:, :] + bias_ref[:, :]
        if spec.relu:
            y = jnp.maximum(y, 0.0)
        return y

    def quantize(hf, spec):
        # identical op sequence to lanenet_int8._quant (division, round,
        # zero-point shift, clip)
        q = jnp.round(hf / spec.act_scale) - spec.zp
        return jnp.clip(q, -128, 127).astype(jnp.int8)

    # ----- body ------------------------------------------------------------
    # pure value dataflow: Mosaic register-allocates the activation
    # stream; scratch-ref round trips through partial lane slices of a
    # max-width buffer measured ~100x slower than the ops themselves
    hf = x3_ref[0, :, :]
    ci = 0
    for specs in blocks:
        s1 = specs[0]
        has_short = len(specs) == 3

        q_in = quantize(hf, s1)

        # conv1 (+relu)
        r1 = conv_refs[ci]; ci += 1
        a9 = taps_matmul(s1, q_in)
        acc = jax.lax.dot_general(
            a9, r1[0][:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        a1 = epilogue(acc, s1, *r1)

        # conv2 (no relu)
        s2 = specs[1]
        r2 = conv_refs[ci]; ci += 1
        q_a1 = quantize(a1, s2)
        a9 = taps_matmul(s2, q_a1)
        acc = jax.lax.dot_general(
            a9, r2[0][:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        a2 = epilogue(acc, s2, *r2)

        # shortcut
        if has_short:
            ss = specs[2]
            rs = conv_refs[ci]; ci += 1
            acc = jax.lax.dot_general(
                q_in, rs[0][:, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            short = epilogue(acc, ss, *rs)
        else:
            short = hf
        hf = jnp.maximum(a2 + short, 0.0)

    # ----- fused 1x1 head (f32 GEMM) --------------------------------------
    logits = jax.lax.dot_general(
        hf, head_w[:, :], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + head_b[:, :]
    out3_ref[0, :, :] = logits


def _run_body(qn: QuantizedLaneNet, stem_f32, *, h, w, ft=1,
              interpret=False):
    """stem_f32: [B, h*w, c_stem] f32 -> logits [B, h*w, n_cls] f32."""
    blocks = _pack(qn)
    c_stem = blocks[0][0].cin
    bsz, n_px_in, _ = stem_f32.shape
    p_pad = _ceil(h * w, SUB)
    assert n_px_in == h * w
    n_cls = np.asarray(qn.head_kernel).shape[-1]
    n_cls_pad = 8

    if bsz % ft:
        raise ValueError(f"batch {bsz} not divisible by ft={ft}")
    x = jnp.pad(stem_f32, ((0, 0), (0, p_pad - h * w), (0, 0)))
    x = x.reshape(bsz // ft, ft * p_pad, c_stem)

    head_w = jnp.pad(
        jnp.asarray(qn.head_kernel, jnp.float32)[0, 0],
        ((0, 0), (0, n_cls_pad - n_cls)))
    head_b = jnp.pad(jnp.asarray(qn.head_bias, jnp.float32),
                     (0, n_cls_pad - n_cls))[None, :]

    consts = []
    for specs in blocks:
        for s in specs:
            consts += [s.wq, s.deq, s.zpsum, s.bias]
    consts += [head_w, head_b]

    kernel = functools.partial(
        _body_kernel, blocks=blocks, h=h, w=w, p_pad=p_pad, c_stem=c_stem,
        n_cls_pad=n_cls_pad, ft=ft, interpret=interpret)

    grid = (bsz // ft,)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((1, ft * p_pad, c_stem),
                               lambda b: (b, 0, 0))] +
                 [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(consts),
        out_specs=pl.BlockSpec((1, ft * p_pad, n_cls_pad),
                               lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz // ft, ft * p_pad, n_cls_pad),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, *consts)
    out = out.reshape(bsz, p_pad, n_cls_pad)[:, :h * w, :n_cls]
    return out


def pallas_int8_forward(qn: QuantizedLaneNet, x_norm, *, ft: int = 1,
                        interpret: bool | None = None):
    """Normalized float NHWC input -> NCHW /4-resolution logits.

    Matches ``int8_apply``'s pre-upsample logits (same stem via
    ``_conv_i8``, body + head in the fused kernel).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    stem_sites = [qn.sites[name] for name, _ in _graph(qn.model)[0]]
    h_f = None
    h_q = _quant(jnp.asarray(x_norm, jnp.float32), stem_sites[0])
    for site in stem_sites:
        if h_f is not None:
            h_q = _quant(h_f, site)
        h_f = _conv_i8(h_q, site)
    bsz, hh, ww, c_stem = h_f.shape
    logits = _run_body(qn, h_f.reshape(bsz, hh * ww, c_stem),
                       h=hh, w=ww, ft=ft, interpret=interpret)
    n_cls = logits.shape[-1]
    return jnp.transpose(logits.reshape(bsz, hh, ww, n_cls), (0, 3, 1, 2))


def pallas_int8_serve(qn: QuantizedLaneNet, images_u8, *, cfg=None,
                      ft: int = 1, interpret: bool | None = None):
    """uint8 frames -> uint8 class maps via the fused int8 kernel.

    The tail (x4 bilinear upsample + argmax) runs channel-first in XLA,
    like ``lanenet_lite.serve_apply``.
    """
    from ..ops.augment import AugmentConfig, eval_batch

    x, _ = eval_batch(images_u8, None, cfg or AugmentConfig(),
                      with_labels=False)
    y = pallas_int8_forward(qn, x, ft=ft, interpret=interpret)
    n, c, hf, wf = y.shape
    y = jax.image.resize(y, (n, c, hf * 4, wf * 4), method="bilinear")
    return jnp.argmax(y, axis=1).astype(jnp.uint8)
