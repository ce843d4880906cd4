"""Fused Pallas label-extraction kernel vs the golden path.

On CPU the kernel runs in pallas interpret mode; on TPU it compiles for
real (exercised by the TPU drive / bench).
"""
import numpy as np
import pytest

import jax

from sim2real_lane_segment_tpu.ops.labelgen import process_classes
from sim2real_lane_segment_tpu.ops import labelgen_pallas as LP


def on_cpu():
    return jax.devices()[0].platform == "cpu"


def pairs(rng, n=2, h=240, w=320):
    orig = rng.integers(0, 256, (n, h, w, 3), dtype=np.uint8)
    annot = orig.copy()
    annot[:, 50:150, 100:250, 1] = np.clip(
        annot[:, 50:150, 100:250, 1].astype(int) + 80, 0, 255)
    noise = rng.integers(-30, 31, orig.shape)
    nm = rng.random(orig.shape) < 0.02
    annot = np.clip(annot.astype(int) + nm * noise, 0, 255).astype(np.uint8)
    return orig, annot


@pytest.mark.parametrize("h", [240, 100])  # multiple and non-multiple of block
def test_fused_matches_golden(rng, h):
    orig, annot = pairs(rng, h=h)
    want = np.asarray(process_classes(orig, annot))
    got = np.asarray(LP.process_classes_fused(
        orig, annot, interpret=on_cpu()))
    np.testing.assert_array_equal(got, want)


def test_fused_rgb_order(rng):
    orig, annot = pairs(rng, h=120, w=160)
    want = np.asarray(process_classes(orig, annot, channel_order="rgb"))
    got = np.asarray(LP.process_classes_fused(
        orig, annot, channel_order="rgb", interpret=on_cpu()))
    np.testing.assert_array_equal(got, want)
