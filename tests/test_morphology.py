"""Bit-exactness gate: XLA morphology vs cv2 golden (reference semantics).

The reference's label path (rightLaneDatagen/postprocess_v2.py:40-44) runs
cv2.morphologyEx MORPH_OPEN then MORPH_CLOSE with a 5x5 rect kernel on 0/1
uint8 masks; our reduce_window formulation must match it exactly.
"""
import cv2
import numpy as np
import pytest

from sim2real_lane_segment_tpu.ops import morphology as M

KERNEL5 = cv2.getStructuringElement(cv2.MORPH_RECT, (5, 5))


def random_mask(rng, shape=(120, 160), p=0.3):
    return (rng.random(shape) < p).astype(np.uint8)


@pytest.mark.parametrize("p", [0.05, 0.3, 0.5, 0.9])
def test_erode_matches_cv2(rng, p):
    m = random_mask(rng, p=p)
    got = np.asarray(M.erode(m, 5)).astype(np.uint8)
    want = cv2.erode(m, KERNEL5)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("p", [0.05, 0.3, 0.5, 0.9])
def test_dilate_matches_cv2(rng, p):
    m = random_mask(rng, p=p)
    got = np.asarray(M.dilate(m, 5)).astype(np.uint8)
    want = cv2.dilate(m, KERNEL5)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("p", [0.05, 0.3, 0.5])
def test_open_close_match_cv2(rng, p):
    m = random_mask(rng, p=p)
    np.testing.assert_array_equal(
        np.asarray(M.morph_open(m, 5)).astype(np.uint8),
        cv2.morphologyEx(m, cv2.MORPH_OPEN, KERNEL5))
    np.testing.assert_array_equal(
        np.asarray(M.morph_close(m, 5)).astype(np.uint8),
        cv2.morphologyEx(m, cv2.MORPH_CLOSE, KERNEL5))


def test_structured_shapes(rng):
    # Blobs and thin lines exercise border + opening/closing differently
    # than iid noise.
    m = np.zeros((120, 160), np.uint8)
    m[10:30, 10:50] = 1          # blob
    m[60, :] = 1                  # 1px line (opening kills it)
    m[0:3, 150:160] = 1           # border-touching blob
    m[100:120, 0:2] = 1           # border column
    for op, cvop in [(M.morph_open, cv2.MORPH_OPEN), (M.morph_close, cv2.MORPH_CLOSE)]:
        got = np.asarray(op(m, 5)).astype(np.uint8)
        want = cv2.morphologyEx(m, cvop, KERNEL5)
        np.testing.assert_array_equal(got, want)


def test_batched_equals_per_frame(rng):
    batch = np.stack([random_mask(rng) for _ in range(4)])
    got = np.asarray(M.morph_open(batch, 5))
    for i in range(4):
        np.testing.assert_array_equal(got[i], np.asarray(M.morph_open(batch[i], 5)))
