"""Deterministic, shard-aware epoch samplers.

The reference's samplers were the reason its data-parallel path was broken
(reference README.md:275-277): ``WeightedRandomSampler`` and
``ParallelDataset`` were stateful host constructs that couldn't be
replicated across DDP workers.  Here every sampler is a pure function of
``(seed, epoch)`` producing the *global* index sequence, which is then
sliced per data-parallel shard — identical math on every host, no state.

Semantics preserved:
- ``shuffle_epoch``: uniform shuffle (SimulatorDataModule train loader,
  reference dataModules.py:51-53).
- ``two_domain_epoch``: WeightedRandomSampler with per-domain weights
  1/len(domain) and replacement over concat(source, target) — i.e. each
  draw picks a domain 50/50, then a uniform element of it
  (reference dataModules.py:74-85).
- ``mme_epoch``: the same draws, paired with unlabelled indices by the
  ParallelDataset modulo rule ``idx % len(unlabelled)``
  (reference myDatasets.py:88-92, dataModules.py:108-121).
"""
from __future__ import annotations

import numpy as np


def _rng(seed: int, epoch: int) -> np.random.Generator:
    return np.random.default_rng(np.random.SeedSequence([seed, epoch]))


def shuffle_epoch(n: int, seed: int, epoch: int) -> np.ndarray:
    return _rng(seed, epoch).permutation(n)


def two_domain_epoch(n_source: int, n_target: int, seed: int, epoch: int) -> np.ndarray:
    """Indices into concat(source, target) — source ids < n_source."""
    rng = _rng(seed, epoch)
    n = n_source + n_target
    pick_target = rng.random(n) < 0.5
    src_idx = rng.integers(0, n_source, n)
    tgt_idx = rng.integers(0, n_target, n) + n_source
    return np.where(pick_target, tgt_idx, src_idx)


def mme_epoch(n_source: int, n_target: int, n_unlabelled: int,
              seed: int, epoch: int) -> tuple[np.ndarray, np.ndarray]:
    labelled = two_domain_epoch(n_source, n_target, seed, epoch)
    unlabelled = labelled % n_unlabelled
    return labelled, unlabelled


def shard(indices: np.ndarray, shard_id: int, num_shards: int,
          batch_size: int) -> np.ndarray:
    """Slice a global index sequence for one data-parallel shard.

    Drops the trailing partial global batch so every shard sees the same
    number of identically-shaped batches (static shapes for jit).
    """
    per_batch = batch_size * num_shards
    n_batches = len(indices) // per_batch
    usable = indices[: n_batches * per_batch].reshape(n_batches, num_shards, batch_size)
    return usable[:, shard_id, :].reshape(-1)


def batched(indices: np.ndarray, batch_size: int, drop_last: bool):
    out = []
    for i in range(0, len(indices), batch_size):
        b = indices[i:i + batch_size]
        if drop_last and len(b) < batch_size:
            break
        out.append(b)
    return out
