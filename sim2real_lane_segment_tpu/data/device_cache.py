"""Device-resident dataset cache: upload a split to HBM once, gather
training batches on device by index.

The host pipeline (datasets.py / modules.py) stages every batch as a
stacked uint8 array and pays one host->device transfer per step.  At the
reference's native recording resolution (640x480, recorder.py:24) a
batch-64 step moves ~59 MB — through a slow host link that transfer, not
TPU compute, dominates the train step (measured ~0.8 s/batch vs ~40 ms
of forward+backward for FCDenseNet67).

A :class:`DeviceCachedView` removes the per-step transfer entirely: the
whole split lives in HBM as one uint8 tensor (the typical study-scale
split — ~1.5k frames at 480p — is ~1.2 GB of a v5e's 16 GB), and each
step gathers its batch rows on device from a host-sent index vector
(~256 bytes).  This completes the on-device data path for training:
render -> label extraction -> augment already run on TPU, so with the
gather the only per-step host work is sampling indices.

Enabled via ``device_cache=True`` on the data modules (modules.py) and
``--device_cache`` on the train/domain-study CLIs.  Views are built
lazily on first use; datasets mutated in place afterwards (e.g. by
histogram matching, myDatasets.py:63-71 semantics) must be re-set-up.
"""
from __future__ import annotations

import logging
from typing import Sequence

import numpy as np

log = logging.getLogger(__name__)

_CHUNK_BYTES = 256 * 1024 * 1024


def _row_divisor(sharding) -> int:
    """Number of shards a NamedSharding lays over the leading dim."""
    import numpy as _np
    spec = getattr(sharding, "spec", None)
    if not spec or spec[0] is None:
        return 1
    axes = (spec[0],) if isinstance(spec[0], str) else tuple(spec[0])
    return int(_np.prod([sharding.mesh.shape[a] for a in axes]))


def _chunked_put(arr: np.ndarray, sharding=None):
    """device_put in ~256 MB row chunks, concatenated on device.

    A single multi-GB device_put through this host's device link both
    runs at a fraction of the chunked bandwidth (~8x slower measured)
    and has been observed to leave the backend unable to satisfy any
    further allocation (ResourceExhausted on a 16-byte PRNG split right
    after a 1.6 GB one-shot upload).  Chunking costs one transient 2x
    copy during the concat and avoids both problems.

    With ``sharding`` (data-parallel training, parallel/dp.py) the rows
    are laid over the mesh's data axis — each device holds N/n_data rows
    and the per-device transfer is already a fraction of the whole, so
    the array goes up in one sharded put.  Rows are zero-padded up to
    the shard multiple; padding rows sit past every valid index, so
    gathers never touch them.
    """
    import jax
    import jax.numpy as jnp

    if sharding is not None:
        div = _row_divisor(sharding)
        if len(arr) % div:
            pad = div - len(arr) % div
            arr = np.concatenate([arr, np.zeros((pad,) + arr.shape[1:],
                                                arr.dtype)])
        out = jax.device_put(arr, sharding)
        out.block_until_ready()
        return out

    rows = max(1, _CHUNK_BYTES // max(1, arr[0:1].nbytes))
    if len(arr) <= rows:
        return jax.device_put(arr)
    chunks = [jax.device_put(arr[i:i + rows])
              for i in range(0, len(arr), rows)]
    out = jnp.concatenate(chunks)
    out.block_until_ready()
    return out


class DeviceCachedView:
    """One split resident on device: images [N,H,W,3] u8, labels [N,H,W] u8.

    Degrades gracefully: if the upload or a gather hits device-memory
    exhaustion (the chip is shared — another tenant's allocations can
    transiently squeeze HBM), the view permanently falls back to host
    reads of the same indices, so a multi-hour run survives a pressure
    spike at the cost of speed, not correctness.
    """

    def __init__(self, datasets: Sequence, size: tuple[int, int] | None,
                 images: np.ndarray, labels: np.ndarray | None,
                 sharding=None):
        import jax

        self._datasets = list(datasets)
        self._size = size
        self.images = self.labels = None
        try:
            self.images = _chunked_put(images, sharding)
            if labels is not None:
                self.labels = _chunked_put(labels, sharding)
            log.info("device cache: %d frames, %.0f MB", len(images),
                     (images.nbytes
                      + (labels.nbytes if labels is not None else 0)) / 1e6)
        except Exception as e:  # jax raises Value/RuntimeError variants
            log.warning("device cache upload failed (%s); falling back to "
                        "host reads for this split", e)
            self.images = self.labels = None
        self._have_labels = labels is not None

    @classmethod
    def from_datasets(cls, datasets: Sequence, size: tuple[int, int] | None,
                      sharding=None) -> "DeviceCachedView":
        """Concatenate one or more RightLaneDatasets (host-read once at the
        canonical ``size``) into a single device tensor.  Multi-dataset
        concat serves the two-domain modules, whose samplers index
        concat(source, target) (samplers.two_domain_epoch).  ``sharding``
        (data-parallel training) lays the rows over the mesh instead of
        one device."""
        xs, ys = [], []
        have_labels = all(ds.have_labels for ds in datasets)
        for ds in datasets:
            x, y = ds.read_batch(range(len(ds)), size)
            xs.append(x)
            if have_labels:
                ys.append(y)
        return cls(datasets, size,
                   np.concatenate(xs) if len(xs) > 1 else xs[0],
                   (np.concatenate(ys) if len(ys) > 1 else ys[0])
                   if have_labels else None, sharding)

    def _host_read(self, indices) -> tuple:
        """Concat-indexed host fallback (same index space as the device
        tensor: offsets accumulate across the constituent datasets)."""
        xs, ys = [], []
        for i in np.asarray(indices):
            i = int(i)
            for ds in self._datasets:
                if i < len(ds):
                    x, y = ds[i]
                    break
                i -= len(ds)
            from .datasets import _maybe_resize
            x, y = _maybe_resize(x, y, self._size)
            xs.append(x)
            ys.append(y)
        return np.stack(xs), (np.stack(ys) if self._have_labels else None)

    def gather(self, indices) -> tuple:
        """Batch rows gathered on device; only the index vector crosses
        the host link.  Same (x, y) contract as RightLaneDataset.read_batch
        (device arrays instead of numpy — train/eval steps accept both)."""
        import jax.numpy as jnp

        if self.images is None:
            return self._host_read(indices)
        idx = jnp.asarray(np.asarray(indices, np.int32))
        try:
            x = jnp.take(self.images, idx, axis=0)
            y = (jnp.take(self.labels, idx, axis=0)
                 if self.labels is not None else None)
            # materialize now so an async device OOM surfaces here, where
            # the fallback can still handle it
            x.block_until_ready()
            return x, y
        except Exception as e:
            log.warning("device gather failed (%s); falling back to host "
                        "reads for this split", e)
            self.images = self.labels = None
            return self._host_read(indices)
