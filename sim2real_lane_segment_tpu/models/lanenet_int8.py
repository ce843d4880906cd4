"""Int8 post-training quantization for LaneNetLite serving.

The v5e MXU runs int8 matmuls/convs at ~2x its bf16 rate, and
LaneNetLite's body is exactly the [spatial x C] @ [C x C'] shapes the
MXU wants — so the serving path quantizes it end-to-end:

- BatchNorm folds into the preceding conv (per-output-channel scale +
  bias) since serving always uses running statistics;
- weights are symmetric per-output-channel int8; activations per-tensor
  int8 with 99.95th-percentile scales calibrated on a sample batch.
  Post-relu activations are non-negative, so they use an asymmetric
  zero-point of 128 (doubling effective resolution); the zero-point
  cross term folds into a per-output-channel constant (zp * sum(W)),
  and borders stay exact by padding with the zero-point's code instead
  of 0 before a VALID conv;
- convs run int8 x int8 -> int32 (``preferred_element_type``), then one
  fused dequant+bias+relu+requant elementwise chain (XLA fuses it into
  the conv epilogue);
- residual adds and the tiny 1x1 head/upsample stay float32.

Pure functions over ordinary flax ``variables`` — quantize once
(``quantize_lanenet``), serve with ``int8_apply``.  Accuracy is gated in
tests/test_lanenet_int8.py against the float model's argmax.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

DN = ("NHWC", "HWIO", "NHWC")


def _fold_bn(kernel, bn):
    """Fold an inference-mode BatchNorm into the conv ahead of it."""
    scale = bn["scale"] * jax.lax.rsqrt(bn["var"] + 1e-5)
    shift = bn["bias"] - bn["mean"] * scale
    return kernel * scale[None, None, None, :], shift


def _graph(model):
    """The ordered conv sites of LaneNetLite + the block structure."""
    stem = [(f"ConvBN_{i}", 2) for i in range(len(model.stem))]
    blocks = []
    for i, (f, d) in enumerate(model.body):
        blocks.append((f"ResBlock_{i}", d))
    return stem, blocks


class QuantizedLaneNet:
    """Holder for the quantized network: per-site int8 kernels, scales,
    biases (a plain pytree-of-dicts so it jits as a closure constant)."""

    def __init__(self, model, sites: dict, head_kernel, head_bias):
        self.model = model
        self.sites = sites
        self.head_kernel = head_kernel
        self.head_bias = head_bias


def _collect_float_layers(model, variables):
    """(ordered site name -> dict with folded float kernel + metadata)."""
    fe_p = variables["params"]["featureExtractor"]
    fe_s = variables["batch_stats"]["featureExtractor"]
    stem, blocks = _graph(model)
    layers: dict[str, dict] = {}
    for name, stride in stem:
        w, b = _fold_bn(fe_p[name]["Conv_0"]["kernel"],
                        {**fe_p[name]["BatchNorm_0"],
                         **fe_s[name]["BatchNorm_0"]})
        layers[name] = dict(kernel=w, bias=b, stride=stride, dilation=1,
                            relu=True)
    for name, dil in blocks:
        bp, bs = fe_p[name], fe_s[name]
        w1, b1 = _fold_bn(bp["ConvBN_0"]["Conv_0"]["kernel"],
                          {**bp["ConvBN_0"]["BatchNorm_0"],
                           **bs["ConvBN_0"]["BatchNorm_0"]})
        layers[f"{name}/conv1"] = dict(kernel=w1, bias=b1, stride=1,
                                       dilation=dil, relu=True)
        w2, b2 = _fold_bn(bp["Conv_0"]["kernel"],
                          {**bp["BatchNorm_0"], **bs["BatchNorm_0"]})
        layers[f"{name}/conv2"] = dict(kernel=w2, bias=b2, stride=1,
                                       dilation=dil, relu=False)
        if "Conv_1" in bp:
            layers[f"{name}/short"] = dict(kernel=bp["Conv_1"]["kernel"],
                                           bias=jnp.zeros(w2.shape[-1]),
                                           stride=1, dilation=1, relu=False)
    return layers


def _same_pad(size: int, k: int, s: int, d: int) -> tuple[int, int]:
    """flax/XLA 'SAME' padding (asymmetric for strided convs)."""
    out = -(-size // s)
    total = max((out - 1) * s + (k - 1) * d + 1 - size, 0)
    return total // 2, total - total // 2


def _conv_f32(x, layer):
    d, st = layer["dilation"], layer["stride"]
    k = layer["kernel"].shape[0]
    pads = [_same_pad(x.shape[1], k, st, d), _same_pad(x.shape[2], k, st, d)]
    y = jax.lax.conv_general_dilated(
        x, layer["kernel"].astype(jnp.float32), (st, st), pads,
        rhs_dilation=(d, d), dimension_numbers=DN)
    y = y + layer["bias"]
    return jnp.maximum(y, 0.0) if layer["relu"] else y


def _float_forward(model, layers, x, record=None):
    """Float shadow forward over the folded graph; ``record`` collects
    absmax of every quantized-conv INPUT."""

    def note(name, t):
        if record is not None:
            # 99.95th-percentile calibration clips rare outliers that
            # would otherwise stretch the scale and crush resolution
            record[name] = max(record.get(name, 0.0),
                               float(jnp.percentile(jnp.abs(t), 99.95)))
        return t

    stem, blocks = _graph(model)
    h = x
    for name, _ in stem:
        h = _conv_f32(note(name, h), layers[name])
    for name, _ in blocks:
        inp = note(f"{name}/conv1", h)
        a = _conv_f32(inp, layers[f"{name}/conv1"])
        a = _conv_f32(note(f"{name}/conv2", a), layers[f"{name}/conv2"])
        short = _conv_f32(inp, layers[f"{name}/short"]) \
            if f"{name}/short" in layers else h
        h = jnp.maximum(a + short, 0.0)
    return h


def quantize_lanenet(model, variables, calib_x) -> QuantizedLaneNet:
    """Fold BN, calibrate activation scales on ``calib_x`` (normalized
    float NHWC), and quantize every conv to per-channel int8."""
    layers = _collect_float_layers(model, variables)
    record: dict[str, float] = {}
    _float_forward(model, layers, jnp.asarray(calib_x, jnp.float32),
                   record=record)
    record = {k: max(v, 1e-6) for k, v in record.items()}

    stem_first = _graph(model)[0][0][0]
    sites = {}
    for name, layer in layers.items():
        w = np.asarray(layer["kernel"], np.float32)
        w_scale = np.maximum(np.abs(w).max(axis=(0, 1, 2)), 1e-8) / 127.0
        w_q = np.clip(np.round(w / w_scale), -127, 127).astype(np.int8)
        a_key = name if name in record else name.rsplit("/", 1)[0] + "/conv1"
        # post-relu inputs are non-negative -> asymmetric zp=128 over the
        # full [0, amax] range; the (signed) first conv input stays
        # symmetric
        zp = 0 if a_key == stem_first else 128
        act_scale = record[a_key] / (127.0 if zp == 0 else 255.0)
        sites[name] = dict(
            w_q=jnp.asarray(w_q),
            w_scale=jnp.asarray(w_scale, jnp.float32),
            w_colsum=jnp.asarray(
                w_q.astype(np.int64).sum(axis=(0, 1, 2)).astype(np.float32)),
            bias=jnp.asarray(layer["bias"], jnp.float32),
            act_scale=jnp.float32(act_scale),
            zp=zp, stride=layer["stride"], dilation=layer["dilation"],
            relu=layer["relu"])

    head = variables["params"]["classifier"]["head"]
    return QuantizedLaneNet(model, sites, head["kernel"], head["bias"])


def _conv_i8(x_q, site):
    """int8 conv -> int32 accumulate; returns float32 (dequant + bias).

    The quantized code q represents x = scale * (q + zp); padding uses
    the code of x=0 (-zp) so borders dequantize exactly, and the zp
    cross term is the per-output-channel constant zp * sum(W)."""
    d, st = site["dilation"], site["stride"]
    k = site["w_q"].shape[0]
    ph = _same_pad(x_q.shape[1], k, st, d)
    pw = _same_pad(x_q.shape[2], k, st, d)
    zp = site["zp"]
    xp = jnp.pad(x_q, ((0, 0), ph, pw, (0, 0)),
                 constant_values=np.int8(-zp)) if (ph != (0, 0) or
                                                   pw != (0, 0)) else x_q
    y = jax.lax.conv_general_dilated(
        xp, site["w_q"], (st, st), ((0, 0), (0, 0)),
        rhs_dilation=(d, d), dimension_numbers=DN,
        preferred_element_type=jnp.int32)
    y = (y.astype(jnp.float32) + zp * site["w_colsum"]) \
        * (site["act_scale"] * site["w_scale"]) + site["bias"]
    return jnp.maximum(y, 0.0) if site["relu"] else y


def _quant(x_f, site):
    """float -> int8 code: q = round(x / scale) - zp."""
    q = jnp.round(x_f / site["act_scale"]) - site["zp"]
    return jnp.clip(q, -128, 127).astype(jnp.int8)


def int8_apply(qn: QuantizedLaneNet, x, *, use_softmax: bool = False):
    """Quantized forward: normalized float NHWC input -> class scores,
    matching ``model.apply(..., train=False)`` semantics."""
    stem, blocks = _graph(qn.model)
    h_q = _quant(x.astype(jnp.float32), qn.sites[stem[0][0]])
    h_f = None
    for name, _ in stem:
        site = qn.sites[name]
        if h_f is not None:
            h_q = _quant(h_f, site)
        h_f = _conv_i8(h_q, site)
    for name, _ in blocks:
        s1 = qn.sites[f"{name}/conv1"]
        in_q = _quant(h_f, s1)
        a = _conv_i8(in_q, s1)
        s2 = qn.sites[f"{name}/conv2"]
        a = _conv_i8(_quant(a, s2), s2)
        if f"{name}/short" in qn.sites:
            short = _conv_i8(in_q, qn.sites[f"{name}/short"])
        else:
            short = h_f
        h_f = jnp.maximum(a + short, 0.0)

    n, hf, wf, _ = h_f.shape
    y = jax.lax.conv_general_dilated(
        h_f, qn.head_kernel.astype(jnp.float32), (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=DN) + qn.head_bias
    y = jax.image.resize(y, (n, hf * 4, wf * 4, y.shape[-1]),
                         method="bilinear")
    return jax.nn.softmax(y, axis=-1) if use_softmax else y
