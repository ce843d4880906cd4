"""Sharding layout for multi-chip training.

The model is a 1-10M-param CNN — data parallelism over the ``data`` mesh
axis is the dominant strategy (SURVEY.md §2.3): batch sharded, parameters
replicated, gradient all-reduce compiled by XLA over ICI.  An optional
``model`` axis channel-shards the widest conv kernels (the dense-block
concat convs), demonstrated in the multichip dry-run; at this model size
it is off by default.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.mesh import DATA_AXIS, MODEL_AXIS, make_mesh


def make_train_mesh(n_devices: int | None = None, n_model: int = 1) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return make_mesh(n_model=n_model, devices=devices)


def put_global(x, sharding: NamedSharding):
    """Host array -> global device array, multi-process aware.

    Single process: plain device_put.  Under ``jax.distributed`` the mesh
    spans non-addressable devices, so each process contributes its LOCAL
    portion via ``make_array_from_process_local_data`` (for a replicated
    spec the local portion is the full array)."""
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    return jax.make_array_from_process_local_data(sharding, np.asarray(x))


def shard_train_batch(mesh: Mesh, batch):
    """Batch axis over data; replicated over model.  In a multi-process
    run each process passes its per-process batch shard (the slice its
    shard-aware sampler produced, data/samplers.py)."""
    sh = NamedSharding(mesh, P(DATA_AXIS))
    return jax.tree_util.tree_map(lambda x: put_global(x, sh), batch)


def param_spec(path, leaf, shard_model_channels: bool) -> P:
    """Replicate params; optionally shard wide conv output channels on the
    model axis (kernel HWIO -> shard O when divisible and wide enough)."""
    if shard_model_channels and leaf.ndim == 4 and leaf.shape[-1] >= 64:
        return P(None, None, None, MODEL_AXIS)
    return P()


def shard_params(mesh: Mesh, params, shard_model_channels: bool = False):
    def put(path, leaf):
        spec = param_spec(path, leaf, shard_model_channels and
                          mesh.shape[MODEL_AXIS] > 1)
        # only shard if divisible
        if spec != P() and leaf.shape[-1] % mesh.shape[MODEL_AXIS] != 0:
            spec = P()
        return put_global(leaf, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map_with_path(put, params)


def replicate(mesh: Mesh, tree):
    sh = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: put_global(x, sh), tree)
