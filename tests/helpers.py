"""Shared test helpers: synthetic dataset trees + small model configs."""
import os

import cv2
import numpy as np

from sim2real_lane_segment_tpu.core.dtypes import F32_POLICY
from sim2real_lane_segment_tpu.models.tiramisu import FCDenseNet


def tiny_model(num_cls=4):
    """A small FCDenseNet (same structure, fewer blocks) for fast CPU tests."""
    return FCDenseNet(n_classes=num_cls, down_blocks=(2, 2), up_blocks=(2, 2),
                      bottleneck_layers=2, growth_rate=4,
                      out_chans_first_conv=8, policy=F32_POLICY)


def write_split(root, n, rng, h=48, w=64, with_labels=True):
    """Write a synthetic input/label PNG split with a learnable structure:
    right image half -> class 1, a small box -> class 3."""
    os.makedirs(os.path.join(root, "input"), exist_ok=True)
    if with_labels:
        os.makedirs(os.path.join(root, "label"), exist_ok=True)
    for i in range(n):
        img = rng.integers(0, 80, (h, w, 3), dtype=np.uint8)
        img[:, w // 2:, 1] += 120            # green right half
        label = np.zeros((h, w), np.uint8)
        label[:, w // 2:] = 1
        if i % 2 == 0:
            img[5:15, 5:15, 2] += 150        # red box
            label[5:15, 5:15] = 3
        cv2.imwrite(os.path.join(root, "input", f"{i:06d}.png"), img)
        if with_labels:
            cv2.imwrite(os.path.join(root, "label", f"{i:06d}.png"), label)


def make_sim_tree(tmp_path, rng, n_train=8, n_valid=4, n_test=4):
    root = str(tmp_path / "simData")
    write_split(os.path.join(root, "train"), n_train, rng)
    write_split(os.path.join(root, "valid"), n_valid, rng)
    write_split(os.path.join(root, "test"), n_test, rng)
    return root


def make_simreal_tree(tmp_path, rng, n_source=8, n_target=4, n_unlabelled=16,
                      n_test=4):
    root = str(tmp_path / "simRealData")
    write_split(os.path.join(root, "source"), n_source, rng)
    write_split(os.path.join(root, "target", "train"), n_target, rng)
    write_split(os.path.join(root, "target", "test"), n_test, rng)
    write_split(os.path.join(root, "target", "unlabelled"), n_unlabelled, rng,
                with_labels=False)
    return root
