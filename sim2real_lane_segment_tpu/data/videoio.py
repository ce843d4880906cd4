"""Video I/O: FFV1 lossless AVI reading/writing + batched frame streaming.

Capability parity with the reference's recording format
(rightLaneDatagen/gym_duckietown/recorder.py:24: FFV1 lossless AVI,
640x480 @ 30fps) and its video consumers (postprocess_v2.py,
makeDemoVideo.py, preprocessDatabase.py).  Reading is batched — frames
are accumulated into (N, H, W, 3) uint8 blocks sized for the device
pipeline instead of the reference's frame-at-a-time loops.
"""
from __future__ import annotations

import contextlib
import os
import threading
import queue
from typing import Iterator

import cv2
import numpy as np


def read_frames(path: str, batch_size: int = 64) -> Iterator[np.ndarray]:
    """Yield (N, H, W, 3) uint8 BGR batches from a video file."""
    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise IOError(f"could not open video {path}")
    try:
        buf = []
        while True:
            ret, frame = cap.read()
            if not ret:
                break
            buf.append(frame)
            if len(buf) == batch_size:
                yield np.stack(buf)
                buf = []
        if buf:
            yield np.stack(buf)
    finally:
        cap.release()


def read_paired_frames(path_a: str, path_b: str,
                       batch_size: int = 64) -> Iterator[tuple[np.ndarray, np.ndarray]]:
    """Yield paired batches from two equal-length videos (orig/annot)."""
    it_a = read_frames(path_a, batch_size)
    it_b = read_frames(path_b, batch_size)
    for a, b in zip(it_a, it_b):
        n = min(len(a), len(b))
        yield a[:n], b[:n]


def frame_count(path: str) -> int:
    cap = cv2.VideoCapture(path)
    try:
        return int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    finally:
        cap.release()


def fps_of(path: str) -> float:
    cap = cv2.VideoCapture(path)
    try:
        return float(cap.get(cv2.CAP_PROP_FPS)) or 30.0
    finally:
        cap.release()


class VideoWriter:
    """FFV1 AVI writer; accepts single frames or (N, H, W, 3) batches."""

    def __init__(self, path: str, frame_size: tuple[int, int] = (640, 480),
                 fps: float = 30.0, is_color: bool = True):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        fourcc = cv2.VideoWriter_fourcc(*"FFV1")
        self._w = cv2.VideoWriter(path, fourcc, fps, frame_size, is_color)
        if not self._w.isOpened():
            raise IOError(f"could not open video writer {path}")
        self.path = path

    def write(self, frames: np.ndarray) -> None:
        frames = np.asarray(frames)
        if frames.ndim == 3:
            frames = frames[None]
        for f in frames:
            self._w.write(f)

    def release(self) -> None:
        self._w.release()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.release()


class AsyncVideoWriter:
    """Threaded writer: enqueue batches, encode on a background thread.

    The reference's Recorder used the same queue+thread shape
    (recorder.py:21-63); here it decouples TPU inference throughput from
    FFV1 encode throughput.
    """

    def __init__(self, path: str, frame_size=(640, 480), fps=30.0,
                 is_color=True, maxsize: int = 8):
        self._writer = VideoWriter(path, frame_size, fps, is_color)
        self._q: queue.Queue = queue.Queue(maxsize=maxsize)
        self._err: BaseException | None = None
        self._t = threading.Thread(target=self._run, daemon=True)
        self._t.start()

    def _run(self):
        while True:
            item = self._q.get()
            if item is None:
                break
            try:
                self._writer.write(item)
            except BaseException as e:  # surfaced on close()
                self._err = e
                break

    def write(self, frames) -> None:
        if self._err:
            raise self._err
        self._q.put(np.asarray(frames))

    def close(self) -> None:
        self._q.put(None)
        self._t.join()
        self._writer.release()
        if self._err:
            raise self._err

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        with contextlib.suppress(Exception):
            self.close()
