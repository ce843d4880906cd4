"""Bit-exactness gate for the full label-extraction pipeline.

Golden implementation below mirrors reference
rightLaneDatagen/postprocess_v2.py:29-53 semantics using cv2/numpy directly
(written independently here as the test oracle — it is *the published
algorithm*, not a code copy).
"""
import cv2
import numpy as np

from sim2real_lane_segment_tpu.ops.labelgen import process_classes


def golden_process_classes(img_orig, img_ant):
    img_orig = img_orig.astype(np.int16)
    img_ant = img_ant.astype(np.int16)
    diff = img_ant - img_orig
    b, g, r = diff[..., 0], diff[..., 1], diff[..., 2]
    left = b > 0
    right = g > 0
    obst = (r > 0) | ((r >= 0) & ((b < 0) | (g < 0)))
    kernel = cv2.getStructuringElement(cv2.MORPH_RECT, (5, 5))
    cats = []
    for m in (left, right, obst):
        m = m.astype(np.uint8)
        m = cv2.morphologyEx(m, cv2.MORPH_OPEN, kernel)
        m = cv2.morphologyEx(m, cv2.MORPH_CLOSE, kernel)
        cats.append(m.astype(bool))
    left, right, obst = cats
    out = np.zeros(diff.shape[:-1], np.uint8)
    out[right] = 1
    out[left] = 2
    out[obst] = 3
    return out


def make_pair(rng, h=120, w=160):
    orig = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    annot = orig.copy()
    # recolored patches in each channel direction, like annotated textures
    annot[20:60, 30:90, 0] = np.clip(annot[20:60, 30:90, 0].astype(int) + 60, 0, 255)
    annot[70:100, 10:70, 1] = np.clip(annot[70:100, 10:70, 1].astype(int) + 80, 0, 255)
    annot[40:80, 100:150, 2] = np.clip(annot[40:80, 100:150, 2].astype(int) + 50, 0, 255)
    annot[5:15, 5:15, 1] = np.clip(annot[5:15, 5:15, 1].astype(int) - 90, 0, 255)
    # plus noise so sign rules hit every branch
    noise_mask = rng.random((h, w, 3)) < 0.02
    noise = rng.integers(-30, 31, (h, w, 3))
    annot = np.clip(annot.astype(int) + noise_mask * noise, 0, 255).astype(np.uint8)
    return orig, annot


def test_process_classes_bit_exact(rng):
    for _ in range(3):
        orig, annot = make_pair(rng)
        got = np.asarray(process_classes(orig, annot))
        want = golden_process_classes(orig, annot)
        np.testing.assert_array_equal(got, want)


def test_identical_frames_give_empty_mask(rng):
    orig, _ = make_pair(rng)
    got = np.asarray(process_classes(orig, orig))
    assert got.max() == 0


def test_batch_processing(rng):
    pairs = [make_pair(rng) for _ in range(4)]
    origs = np.stack([p[0] for p in pairs])
    annots = np.stack([p[1] for p in pairs])
    got = np.asarray(process_classes(origs, annots))
    for i in range(4):
        np.testing.assert_array_equal(got[i], golden_process_classes(origs[i], annots[i]))


def test_rgb_channel_order(rng):
    orig, annot = make_pair(rng)
    got_rgb = np.asarray(process_classes(orig[..., ::-1], annot[..., ::-1],
                                         channel_order="rgb"))
    want = golden_process_classes(orig, annot)
    np.testing.assert_array_equal(got_rgb, want)
