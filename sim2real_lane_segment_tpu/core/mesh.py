"""Device-mesh utilities.

The reference project was a single-GPU stack whose data-parallel path was
documented broken (reference README.md:275-277, "Distributed training is
currently not working because of custom samplers").  Here data parallelism is
first-class: a ``jax.sharding.Mesh`` with a ``data`` axis (and an optional
``model`` axis for channel sharding of the CNN), batches sharded over
``data`` and parameters replicated, with XLA inserting the psum collectives
over ICI.
"""
from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def local_device_count() -> int:
    return jax.local_device_count()


def make_mesh(n_data: int | None = None, n_model: int = 1,
              devices: Sequence[jax.Device] | None = None) -> Mesh:
    """Build an (data, model) mesh over the given (default: all) devices.

    With ``n_data=None`` the data axis absorbs every device not used by the
    model axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n_data is None:
        if n % n_model != 0:
            raise ValueError(f"{n} devices not divisible by model axis {n_model}")
        n_data = n // n_model
    if n_data * n_model > n:
        raise ValueError(f"mesh {n_data}x{n_model} needs more than {n} devices")
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis; rest replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a host batch (pytree of arrays) sharded over the data axis."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
