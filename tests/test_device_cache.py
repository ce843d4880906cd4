"""DeviceCachedView: chunked upload, gather parity, host fallback.

The cache replaces the reference's per-step host->device staging (the
torch DataLoader pin_memory path, rightLaneNetwork/train.py:48-56) with
one upload + on-device index gathers (data/device_cache.py).
"""
import numpy as np
import pytest

from sim2real_lane_segment_tpu.data import device_cache
from sim2real_lane_segment_tpu.data.datasets import RightLaneDataset
from sim2real_lane_segment_tpu.data.device_cache import DeviceCachedView

from helpers import write_split


@pytest.fixture
def split(tmp_path):
    rng = np.random.default_rng(0)
    write_split(str(tmp_path / "train"), 10, rng)
    return RightLaneDataset(str(tmp_path / "train"))


def test_gather_matches_host_read(split):
    view = DeviceCachedView.from_datasets([split], None)
    assert view.images is not None
    idx = [0, 9, 3, 3]
    x, y = view.gather(idx)
    xh, yh = split.read_batch(idx, None)
    np.testing.assert_array_equal(np.asarray(x), xh)
    np.testing.assert_array_equal(np.asarray(y), yh)


def test_chunked_upload_path(split, monkeypatch):
    # force multi-chunk uploads: one 48x64 frame is ~9 KB
    monkeypatch.setattr(device_cache, "_CHUNK_BYTES", 32 * 1024)
    view = DeviceCachedView.from_datasets([split], None)
    assert view.images is not None and len(view.images) == 10
    x, y = view.gather(range(10))
    xh, yh = split.read_batch(range(10), None)
    np.testing.assert_array_equal(np.asarray(x), xh)
    np.testing.assert_array_equal(np.asarray(y), yh)


def test_multi_dataset_concat_index_space(split, tmp_path):
    rng = np.random.default_rng(1)
    write_split(str(tmp_path / "second"), 4, rng)
    second = RightLaneDataset(str(tmp_path / "second"))
    view = DeviceCachedView.from_datasets([split, second], None)
    # index 12 lands in the second dataset at offset 2
    x, _ = view.gather([12])
    xh, _ = second.read_batch([2], None)
    np.testing.assert_array_equal(np.asarray(x)[0], xh[0])


def test_upload_failure_falls_back_to_host(split, monkeypatch):
    def boom(arr):
        raise ValueError("RESOURCE_EXHAUSTED: TPU backend error")
    monkeypatch.setattr(device_cache, "_chunked_put", boom)
    view = DeviceCachedView.from_datasets([split], None)
    assert view.images is None
    x, y = view.gather([1, 2])
    xh, yh = split.read_batch([1, 2], None)
    np.testing.assert_array_equal(np.asarray(x), xh)
    np.testing.assert_array_equal(np.asarray(y), yh)


def test_gather_failure_degrades_permanently(split, monkeypatch):
    view = DeviceCachedView.from_datasets([split], None)
    assert view.images is not None

    import jax.numpy as jnp

    def boom(*a, **k):
        raise ValueError("RESOURCE_EXHAUSTED: TPU backend error")
    monkeypatch.setattr(jnp, "take", boom)
    x, y = view.gather([4, 5])          # device path dies -> host fallback
    assert view.images is None          # degraded for good
    monkeypatch.undo()
    xh, yh = split.read_batch([4, 5], None)
    np.testing.assert_array_equal(np.asarray(x), xh)
    np.testing.assert_array_equal(np.asarray(y), yh)
