"""Fused int8 Pallas body kernel vs the XLA int8 path (interpret mode).

The kernel replicates lanenet_int8's arithmetic op-for-op, so the
pre-upsample logits must match the XLA int8 oracle to f32 tolerance and
the serving maps must agree with int8_apply's argmax.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sim2real_lane_segment_tpu.core.dtypes import F32_POLICY
from sim2real_lane_segment_tpu.models.lanenet_int8 import (
    _conv_i8, _graph, _quant, int8_apply, quantize_lanenet)
from sim2real_lane_segment_tpu.models.lanenet_lite import LaneNetLite
from sim2real_lane_segment_tpu.models.lanenet_pallas import (
    pallas_int8_forward, pallas_int8_serve)


def _oracle_preresize(qn, x):
    """int8_apply's computation up to the pre-upsample NHWC logits."""
    stem, blocks = _graph(qn.model)
    h_q = _quant(jnp.asarray(x, jnp.float32), qn.sites[stem[0][0]])
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
        short = _conv_i8(in_q, qn.sites[f"{name}/short"]) \
            if f"{name}/short" in qn.sites else h_f
        h_f = jnp.maximum(a + short, 0.0)
    y = jax.lax.conv_general_dilated(
        h_f, jnp.asarray(qn.head_kernel, jnp.float32), (1, 1),
        ((0, 0), (0, 0)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + qn.head_bias


@pytest.fixture(scope="module")
def small_qn():
    # dilations 1/2/4 and one channel-changing block exercise every
    # kernel path (tap masks, shortcut GEMM, f32 residual carry)
    model = LaneNetLite(n_classes=4, stem=(8, 16),
                        body=((16, 1), (16, 2), (32, 4)), policy=F32_POLICY)
    x0 = jnp.zeros((1, 24, 32, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x0)
    calib = jax.random.normal(jax.random.key(1), (4, 24, 32, 3)) * 0.5
    qn = quantize_lanenet(model, variables, calib)
    return model, qn


def test_kernel_matches_int8_oracle(small_qn):
    _, qn = small_qn
    x = np.asarray(
        jax.random.normal(jax.random.key(2), (4, 24, 32, 3))) * 0.7
    ref = np.asarray(_oracle_preresize(qn, x))          # NHWC
    out = np.asarray(pallas_int8_forward(qn, x, interpret=True))
    out_nhwc = np.transpose(out, (0, 2, 3, 1))
    np.testing.assert_allclose(out_nhwc, ref, rtol=1e-5, atol=1e-4)


def test_kernel_ft2_matches(small_qn):
    _, qn = small_qn
    x = np.asarray(
        jax.random.normal(jax.random.key(3), (4, 24, 32, 3))) * 0.7
    a = np.asarray(pallas_int8_forward(qn, x, ft=1, interpret=True))
    b = np.asarray(pallas_int8_forward(qn, x, ft=2, interpret=True))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)


@pytest.mark.slow
def test_serve_agrees_with_int8_apply(small_qn):
    _, qn = small_qn
    u8 = np.random.default_rng(5).integers(
        0, 255, (2, 24, 32, 3), dtype=np.uint8)
    from sim2real_lane_segment_tpu.ops.augment import AugmentConfig, eval_batch
    cfg = AugmentConfig(height=24, width=32)
    x, _ = eval_batch(jnp.asarray(u8), None, cfg, with_labels=False)
    ref_cls = np.argmax(np.asarray(int8_apply(qn, x)), -1)
    out = np.asarray(pallas_int8_serve(qn, jnp.asarray(u8), cfg=cfg,
                                       interpret=True))
    agree = (ref_cls == out).mean()
    assert agree >= 0.999, agree
