"""Data modules: the three training-regime data configurations.

Rebuilds the reference's LightningDataModules
(rightLaneNetwork/dataManagement/dataModules.py:11-128) as host-side batch
producers that hand raw uint8 batches to the on-device transform pipeline:

- ``SimulatorDataModule``  — train/valid/test under one root (regime 'sim').
- ``TwoDomainDataModule``  — source + target/train with 50/50 domain
  sampling; val == test == target/test (regime 'st').
- ``TwoDomainMMEDataModule`` — additionally pairs every labelled draw with
  an unlabelled target frame (regime 'mme'); asserts
  len(labelled) <= len(unlabelled) like the reference (dataModules.py:112).

Unlike the reference (augmentation on 8 dataloader worker processes),
batches leave the host as stacked uint8; resize/augment/normalize run on
TPU (ops/augment.py).  A background thread pool overlaps disk reads with
device compute (see prefetch.py).  With ``device_cache=True`` the splits
live in HBM and batches are gathered on device by index — no per-step
host transfer at all (device_cache.py).
"""
from __future__ import annotations

import os
from typing import Iterator, Tuple

import numpy as np

from . import samplers
from .datasets import RightLaneDataset

Batch = Tuple[np.ndarray, np.ndarray | None]


class BaseDataModule:
    def __init__(self, data_path: str, *, batch_size: int = 32, seed: int = 42,
                 load_into_memory: bool = False, shard_id: int = 0,
                 num_shards: int = 1, device_cache: bool = False):
        self.data_path = data_path
        self.batch_size = batch_size
        self.seed = seed
        self.load_into_memory = load_into_memory
        self.shard_id = shard_id
        self.num_shards = num_shards
        self.device_cache = device_cache
        # set by the DP wiring (cli/train.py): a NamedSharding laying
        # cached split rows over the mesh's data axis (device_cache.py)
        self.cache_sharding = None
        self._views: dict[tuple, object] = {}
        self.datasets: dict[str, RightLaneDataset] = {}
        # canonical (h, w) all host reads are normalized to; set at setup()
        # from the primary training split so mixed-resolution datasets
        # (e.g. CycleGAN-upscaled sources) batch cleanly
        self.native_size: tuple[int, int] | None = None

    def _set_native_size(self, primary: str) -> None:
        shape = self.datasets[primary].image_shape
        if shape is not None:
            self.native_size = (shape[0], shape[1])

    # -- subclass API -------------------------------------------------------
    def setup(self) -> None:
        raise NotImplementedError

    def train_batches(self, epoch: int) -> Iterator[Batch]:
        raise NotImplementedError

    def train_scan_inputs(self, epoch: int):
        """Inputs for the scanned multi-step dispatch (loop.py): the
        device-resident arrays of the train split plus the epoch's batch
        index matrix [n_steps, ...] (trainer.run_scan_chunk interprets
        both).  Returns None whenever the per-batch path must be used
        (no device cache, or a view degraded to host reads)."""
        return self._scan_inputs(None, epoch)

    def _scan_inputs(self, view, epoch: int):
        if self.num_shards > 1:
            # scanned dispatch gathers from a single global device cache;
            # under jax.distributed each process caches only its sampler
            # shard, so multi-host runs use the per-batch path (whose
            # shard_batch assembles the global array from local rows)
            return None
        if view is None or view.images is None or view.labels is None:
            return None
        idx = self._train_epoch_indices(epoch)
        n = len(idx) // self.batch_size
        if n == 0:
            return None
        idx = idx[: n * self.batch_size]
        return ((view.images, view.labels),
                np.asarray(idx, np.int32).reshape(n, self.batch_size))

    def _train_epoch_indices(self, epoch: int) -> np.ndarray:
        raise NotImplementedError

    def _view(self, *datasets: RightLaneDataset):
        """Device-resident view of concat(*datasets), built lazily and
        keyed by dataset identity (so aliased splits — e.g. the two-domain
        val == test — share one HBM copy)."""
        from .device_cache import DeviceCachedView
        key = tuple(id(d) for d in datasets)
        if key not in self._views:
            self._views[key] = DeviceCachedView.from_datasets(
                datasets, self.native_size, self.cache_sharding)
        return self._views[key]

    def release_device_cache(self) -> bool:
        """Free every device-resident split cache and revert the module to
        host reads permanently.  HBM-pressure relief valve: on a shared
        chip another tenant's allocations can leave too little memory for
        caches + activations — the fit loop calls this after repeated
        RESOURCE_EXHAUSTED epoch failures (train/loop.py) so a multi-hour
        run trades speed for survival instead of dying.  Returns True if
        any cache was actually freed."""
        freed = False
        for v in self._views.values():
            if v.images is not None or v.labels is not None:
                v.images = v.labels = None
                freed = True
        self._views.clear()
        if self.device_cache:
            self.device_cache = False
            freed = True
        return freed

    def _eval_batches(self, ds: RightLaneDataset) -> Iterator[Batch]:
        idx = np.arange(len(ds))
        view = self._view(ds) if self.device_cache else None
        for b in samplers.batched(idx, self.batch_size, drop_last=False):
            yield view.gather(b) if view else ds.read_batch(b, self.native_size)

    def val_batches(self) -> Iterator[Batch]:
        return self._eval_batches(self.datasets["valid"])

    def test_batches(self) -> Iterator[Batch]:
        return self._eval_batches(self.datasets["test"])

    def steps_per_epoch(self, n: int) -> int:
        return n // (self.batch_size * self.num_shards)


class SimulatorDataModule(BaseDataModule):
    def setup(self) -> None:
        self.datasets["train"] = RightLaneDataset(
            os.path.join(self.data_path, "train"), True,
            load_into_memory=self.load_into_memory)
        self.datasets["valid"] = RightLaneDataset(
            os.path.join(self.data_path, "valid"), True,
            load_into_memory=self.load_into_memory)
        self.datasets["test"] = RightLaneDataset(
            os.path.join(self.data_path, "test"), True)
        self._set_native_size("train")

    def _train_epoch_indices(self, epoch: int) -> np.ndarray:
        idx = samplers.shuffle_epoch(len(self.datasets["train"]), self.seed, epoch)
        return samplers.shard(idx, self.shard_id, self.num_shards, self.batch_size)

    def train_scan_inputs(self, epoch: int):
        view = self._view(self.datasets["train"]) if self.device_cache else None
        return self._scan_inputs(view, epoch)

    def train_batches(self, epoch: int) -> Iterator[Batch]:
        ds = self.datasets["train"]
        idx = self._train_epoch_indices(epoch)
        view = self._view(ds) if self.device_cache else None
        for b in samplers.batched(idx, self.batch_size, drop_last=True):
            yield view.gather(b) if view else ds.read_batch(b, self.native_size)


class TwoDomainDataModule(BaseDataModule):
    def setup(self) -> None:
        self.datasets["source"] = RightLaneDataset(
            os.path.join(self.data_path, "source"), True,
            load_into_memory=self.load_into_memory)
        self.datasets["targetTrain"] = RightLaneDataset(
            os.path.join(self.data_path, "target", "train"), True,
            load_into_memory=self.load_into_memory)
        self.datasets["targetTest"] = RightLaneDataset(
            os.path.join(self.data_path, "target", "test"), True)
        # reference: val == test == target/test (dataModules.py:87-92)
        self.datasets["valid"] = self.datasets["targetTest"]
        self.datasets["test"] = self.datasets["targetTest"]
        self._set_native_size("targetTrain")

    def _concat_read(self, indices) -> Batch:
        from .datasets import _maybe_resize
        src, tgt = self.datasets["source"], self.datasets["targetTrain"]
        xs, ys = [], []
        for i in indices:
            i = int(i)
            x, y = src[i] if i < len(src) else tgt[i - len(src)]
            x, y = _maybe_resize(x, y, self.native_size)
            xs.append(x)
            ys.append(y)
        return np.stack(xs), np.stack(ys)

    def _train_epoch_indices(self, epoch: int) -> np.ndarray:
        idx = samplers.two_domain_epoch(
            len(self.datasets["source"]), len(self.datasets["targetTrain"]),
            self.seed, epoch)
        return samplers.shard(idx, self.shard_id, self.num_shards, self.batch_size)

    def train_scan_inputs(self, epoch: int):
        # sampler ids index concat(source, target) — matching the view's
        # concatenated device tensor
        view = (self._view(self.datasets["source"], self.datasets["targetTrain"])
                if self.device_cache else None)
        return self._scan_inputs(view, epoch)

    def train_batches(self, epoch: int) -> Iterator[Batch]:
        idx = self._train_epoch_indices(epoch)
        view = (self._view(self.datasets["source"], self.datasets["targetTrain"])
                if self.device_cache else None)
        for b in samplers.batched(idx, self.batch_size, drop_last=True):
            yield view.gather(b) if view else self._concat_read(b)


class TwoDomainMMEDataModule(TwoDomainDataModule):
    def setup(self) -> None:
        super().setup()
        self.datasets["targetUnlabelled"] = RightLaneDataset(
            os.path.join(self.data_path, "target", "unlabelled"), False,
            load_into_memory=self.load_into_memory)
        n_labelled = len(self.datasets["source"]) + len(self.datasets["targetTrain"])
        assert n_labelled <= len(self.datasets["targetUnlabelled"]), (
            "MME requires len(labelled) <= len(unlabelled) "
            "(reference dataModules.py:112)")

    def train_scan_inputs(self, epoch: int):
        """MME scan inputs: (lab images, lab labels, unl images) device
        arrays + idx [n_steps, 2, batch] pairing each step's labelled
        batch (row 0, concat(source,target) ids) with its unlabelled
        batch (row 1) — MMETrainer.run_scan_chunk's contract."""
        if not self.device_cache:
            return None
        lab = self._view(self.datasets["source"], self.datasets["targetTrain"])
        unl = self._view(self.datasets["targetUnlabelled"])
        if lab.images is None or lab.labels is None or unl.images is None:
            return None
        lab_idx, unl_idx = samplers.mme_epoch(
            len(self.datasets["source"]), len(self.datasets["targetTrain"]),
            len(self.datasets["targetUnlabelled"]), self.seed, epoch)
        lab_idx = samplers.shard(lab_idx, self.shard_id, self.num_shards,
                                 self.batch_size)
        unl_idx = samplers.shard(unl_idx, self.shard_id, self.num_shards,
                                 self.batch_size)
        n = min(len(lab_idx), len(unl_idx)) // self.batch_size
        if n == 0:
            return None
        cut = n * self.batch_size
        idx = np.stack([np.asarray(lab_idx[:cut], np.int32)
                        .reshape(n, self.batch_size),
                        np.asarray(unl_idx[:cut], np.int32)
                        .reshape(n, self.batch_size)], axis=1)
        return (lab.images, lab.labels, unl.images), idx

    def train_batches(self, epoch: int) -> Iterator[Batch]:
        """Yields ((x_labelled, y), x_unlabelled) 4-tuple batches."""
        unl = self.datasets["targetUnlabelled"]
        lab_idx, unl_idx = samplers.mme_epoch(
            len(self.datasets["source"]), len(self.datasets["targetTrain"]),
            len(unl), self.seed, epoch)
        lab_idx = samplers.shard(lab_idx, self.shard_id, self.num_shards, self.batch_size)
        unl_idx = samplers.shard(unl_idx, self.shard_id, self.num_shards, self.batch_size)
        lab_b = samplers.batched(lab_idx, self.batch_size, drop_last=True)
        unl_b = samplers.batched(unl_idx, self.batch_size, drop_last=True)
        lab_view = (self._view(self.datasets["source"],
                               self.datasets["targetTrain"])
                    if self.device_cache else None)
        unl_view = self._view(unl) if self.device_cache else None
        for lb, ub in zip(lab_b, unl_b):
            if lab_view is not None:
                (x_lab, y), (x_unl, _) = lab_view.gather(lb), unl_view.gather(ub)
            else:
                x_lab, y = self._concat_read(lb)
                x_unl, _ = unl.read_batch(ub, self.native_size)
            yield (x_lab, y), x_unl
