"""Directory-contract dataset readers.

Implements the exact on-disk contracts of the reference
(rightLaneNetwork/dataManagement/myDatasets.py:10-76 and README.md:57-130):
a dataset directory holds ``input/*.png`` and (optionally) ``label/*.png``
with matching zero-padded names.  Images are read with cv2 in BGR
(IMREAD_COLOR) and labels as grayscale — the color convention every other
part of the reference assumes.

Differences from the reference, by design:
- file lists are **sorted** (the reference relied on two independent
  ``glob.glob`` calls returning the same order for input/ and label/);
- ``__getitem__`` returns raw uint8 numpy arrays — all resize/augment/
  normalize work happens on device (ops/augment.py), not per-worker on
  host;
- a threaded ``preload`` fills an in-RAM cache (the reference's
  loadIntoMemory), and ``read_batch`` gathers an index list into stacked
  batch arrays ready for device upload.
"""
from __future__ import annotations

import concurrent.futures as cf
import glob
import logging
import os
from typing import Sequence

import cv2
import numpy as np

log = logging.getLogger(__name__)


class RightLaneDataset:
    """Reader for one ``input/`` (+ ``label/``) PNG directory pair."""

    def __init__(self, data_path: str, have_labels: bool = True, *,
                 load_into_memory: bool = False, num_threads: int = 8):
        self.have_labels = have_labels
        self._input_dir = os.path.join(data_path, "input")
        self._label_dir = os.path.join(data_path, "label")

        if not os.path.isdir(self._input_dir) or (
                have_labels and not os.path.isdir(self._label_dir)):
            raise ValueError(f"Directory structure under {data_path} is not complete!")

        self.input_paths = sorted(glob.glob(os.path.join(self._input_dir, "*.png")))
        if not self.input_paths:
            log.warning("No data found at %s!", data_path)
        if have_labels:
            self.label_paths = sorted(glob.glob(os.path.join(self._label_dir, "*.png")))
            if len(self.input_paths) != len(self.label_paths):
                raise FileNotFoundError(
                    f"Different input and target count encountered at {data_path}!")
        else:
            self.label_paths = None

        self._cache: list | None = None
        if load_into_memory:
            self.preload(num_threads)

    def __len__(self) -> int:
        return len(self.input_paths)

    def _read(self, index: int):
        x = cv2.imread(self.input_paths[index], cv2.IMREAD_COLOR)
        if x is None:
            raise IOError(f"unreadable image {self.input_paths[index]}")
        y = None
        if self.have_labels:
            y = cv2.imread(self.label_paths[index], cv2.IMREAD_GRAYSCALE)
            if y is None:
                raise IOError(f"unreadable label {self.label_paths[index]}")
        return x, y

    def __getitem__(self, index: int):
        if self._cache is not None:
            return self._cache[index]
        return self._read(index)

    def __setitem__(self, index: int, value):
        """Write back in place (used by histogram-matching, reference
        myDatasets.py:63-71)."""
        if self.have_labels:
            img, label = value
            cv2.imwrite(self.label_paths[index], np.asarray(label))
        else:
            img = value
        cv2.imwrite(self.input_paths[index], np.asarray(img))
        if self._cache is not None:
            self._cache[index] = self._read(index)

    def preload(self, num_threads: int = 8) -> None:
        with cf.ThreadPoolExecutor(num_threads) as ex:
            self._cache = list(ex.map(self._read, range(len(self))))

    def read_batch(self, indices: Sequence[int], size: tuple[int, int] | None = None):
        """Gather indices into stacked uint8 arrays (N,H,W,3) / (N,H,W).

        ``size`` (h, w): optional canonical size — images that differ are
        host-resized (bilinear; labels nearest) so mixed-resolution
        datasets batch cleanly (the reference handled this via per-image
        transforms; e.g. CycleGAN-converted sources come back 480x640
        while targets may be stored smaller).
        """
        xs, ys = [], []
        for i in indices:
            x, y = self[int(i)]
            x, y = _maybe_resize(x, y, size)
            xs.append(x)
            ys.append(y)
        x = np.stack(xs)
        y = np.stack(ys) if self.have_labels else None
        return x, y

    @property
    def image_shape(self):
        if len(self) == 0:
            return None
        x, _ = self[0]
        return x.shape


def _maybe_resize(x, y, size: tuple[int, int] | None):
    if size is None or x.shape[:2] == size:
        return x, y
    h, w = size
    x = cv2.resize(x, (w, h), interpolation=cv2.INTER_LINEAR)
    if y is not None and y.shape[:2] != size:
        y = cv2.resize(y, (w, h), interpolation=cv2.INTER_NEAREST)
    return x, y
