"""Int8 PTQ serving path: quantized argmax must track the float model.

Uses the shipped trained weights (artifacts/lanenet_lite_sim.msgpack) on
a rendered sim frame so the gate measures real predictions, not noise.
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sim2real_lane_segment_tpu.core.dtypes import F32_POLICY
from sim2real_lane_segment_tpu.models.lanenet_lite import LaneNetLite
from sim2real_lane_segment_tpu.models.lanenet_int8 import (int8_apply,
                                                           quantize_lanenet)

ART = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                   "lanenet_lite_sim.msgpack")


@pytest.fixture(scope="module")
def trained():
    from flax import serialization

    model = LaneNetLite(n_classes=4, policy=F32_POLICY)
    # the round-1 artifact predates the featureExtractor/classifier split
    # (modules at top level, head inline) — remap into the current layout
    with open(ART, "rb") as f:
        d = serialization.msgpack_restore(f.read())
    variables = {
        "params": {
            "featureExtractor": {k: v for k, v in d["params"].items()
                                 if k != "head"},
            "classifier": {"head": d["params"]["head"]},
        },
        "batch_stats": {"featureExtractor": d["batch_stats"]},
    }
    return model, jax.tree_util.tree_map(jnp.asarray, variables)


@pytest.fixture(scope="module")
def frames():
    from sim2real_lane_segment_tpu.ops.augment import AugmentConfig, eval_batch
    from sim2real_lane_segment_tpu.sim import render
    from sim2real_lane_segment_tpu.sim.maps import builtin_map

    m = builtin_map("small_loop")
    scene = render.build_scene(m, seed=0)
    rng = np.random.default_rng(0)
    imgs = []
    for k in range(4):
        pos = jnp.asarray([0.29 * m.tile_size, (1.2 + 0.2 * k) * m.tile_size])
        imgs.append(np.asarray(render.render_frame(
            scene, pos, jnp.asarray(np.pi / 2), render.DRParams.default(),
            jax.random.key(k), height=120, width=160)))
    u8 = np.stack(imgs)
    x, _ = eval_batch(jnp.asarray(u8), None, AugmentConfig(),
                      with_labels=False)
    return np.asarray(x, np.float32)


@pytest.mark.slow
def test_int8_matches_float_argmax(trained, frames):
    model, variables = trained
    ref = model.apply(variables, frames, train=False, use_softmax=False)
    ref_cls = np.argmax(np.asarray(ref), -1)

    qn = quantize_lanenet(model, variables, frames[:2])
    out = int8_apply(qn, frames)
    out_cls = np.argmax(np.asarray(out), -1)

    agree = (ref_cls == out_cls).mean()
    assert agree > 0.985, f"int8/f32 argmax agreement {agree:.4f}"
    # per-class presence preserved (no class collapses away)
    for c in np.unique(ref_cls):
        if (ref_cls == c).mean() > 0.01:
            assert (out_cls == c).any(), f"class {c} vanished"


def test_int8_weights_are_int8(trained, frames):
    model, variables = trained
    qn = quantize_lanenet(model, variables, frames[:1])
    n_int8 = sum(int(np.prod(s["w_q"].shape)) for s in qn.sites.values())
    assert n_int8 > 500_000  # the body really is quantized
    for s in qn.sites.values():
        assert s["w_q"].dtype == jnp.int8
        assert s["w_scale"].ndim == 1


def test_int8_float_shadow_matches_flax(trained, frames):
    """The folded float graph (calibration forward) must equal the flax
    features — guards the BN-folding math."""
    from sim2real_lane_segment_tpu.models.lanenet_int8 import (
        _collect_float_layers, _float_forward)

    model, variables = trained
    feats_ref = model.apply(variables, frames, train=False,
                            method=lambda m, x, train: m.featureExtractor(
                                x, train=train))
    layers = _collect_float_layers(model, variables)
    feats = _float_forward(model, layers, jnp.asarray(frames))
    np.testing.assert_allclose(np.asarray(feats), np.asarray(feats_ref),
                               atol=1e-3, rtol=1e-3)
