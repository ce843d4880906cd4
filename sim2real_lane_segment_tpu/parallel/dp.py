"""First-class data-parallel training for the production fit path.

The reference documented its distributed training broken
(rightLaneNetwork/README.md:275-277: "Distributed training is currently
not working because of custom samplers in S&T and MME training").  Here
``s2r-train --dp auto`` wraps the regime trainer so every train/eval
step of the UNCHANGED fit loop (train/loop.py) runs under a
``jax.sharding.Mesh``: the global batch is sharded over the ``data``
axis, parameters and optimizer state are replicated, and XLA inserts
the gradient all-reduce over ICI.

Semantics are identical to single-device training on the same global
batch — same deterministic samplers, same key chain, same loss
trajectory (gated in tests/test_dp_train.py for both the supervised and
the MME regime, per-batch and scanned-epoch paths).  That equivalence
is exactly the property whose absence broke the reference's DDP: its
WeightedRandomSampler/ParallelDataset were stateful host constructs
that could not be split across ranks, while this framework's samplers
are pure index functions (data/samplers.py), so a sharded batch is just
a placement decision.

Two deployment shapes share this wrapper:

- single process, N local devices (one TPU host): the module yields the
  full global batch; ``shard_batch`` lays it over the data axis.
- K processes under ``jax.distributed`` (multi-host): each process's
  module yields its per-process shard (samplers.shard with
  shard_id=process_index), and ``shard_batch`` assembles the global
  array from the local portions (parallel/sharding.put_global).
"""
from __future__ import annotations

import logging

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.mesh import DATA_AXIS
from .sharding import put_global

log = logging.getLogger(__name__)


def resolve_dp(dp: str | None, batch_size: int) -> int:
    """``--dp`` flag value -> data-axis size.

    'off'/None/'1' -> 1 (no mesh); 'auto' -> the largest visible device
    count that divides the (per-process) batch size; an integer -> that
    many devices, validated.
    """
    if dp in (None, "off", "0", "1"):
        return 1
    n_dev = len(jax.devices())
    if dp == "auto":
        n = n_dev
        while n > 1 and batch_size % n != 0:
            n -= 1
        if n == 1 and n_dev > 1:
            log.warning("--dp auto: batch_size %d has no divisor among %d "
                        "devices; running single-device", batch_size, n_dev)
        return n
    n = int(dp)
    if n > n_dev:
        raise SystemExit(f"--dp {n}: only {n_dev} devices visible")
    if batch_size % n != 0:
        raise SystemExit(
            f"--dp {n}: batch_size {batch_size} must be divisible by the "
            f"data-axis size")
    return n


def warmup_collective(mesh: Mesh) -> None:
    """Execute one tiny cross-process all-reduce while every rank is
    still in lockstep (right after jax.distributed init).  The CPU
    backend's gloo communicator is created at the FIRST collective with
    a ~30 s context-init timeout; deferring that to the first train step
    — which each rank reaches only after minutes of its own compiles —
    was observed to time out on slow hosts.  Creating the clique here
    lets every later collective reuse it."""
    # put_global under jax.distributed takes each rank's LOCAL portion
    x = put_global(np.ones((mesh.devices.size // jax.process_count(),),
                           np.float32),
                   NamedSharding(mesh, P(DATA_AXIS)))
    total = float(jax.jit(lambda v: v.sum())(x))
    assert total == mesh.devices.size, total
    log.info("cross-process collective warmup OK (%d devices, %d processes)",
             mesh.devices.size, jax.process_count())


class DataParallelTrainer:
    """Wrap a SupervisedTrainer/MMETrainer so train/loop.fit runs
    data-parallel.  Exposes the same fit-loop surface (default_step_fn,
    run_scan_chunk, eval_step, hyper-parameter attributes) and handles
    placement at the boundary: batches onto the data axis, state
    replicated.  The wrapped trainer's jitted steps are reused verbatim
    — GSPMD propagates the input shardings through the step and inserts
    the psum collectives."""

    def __init__(self, trainer, mesh: Mesh):
        self._trainer = trainer
        self.mesh = mesh
        self.batch_sharding = NamedSharding(mesh, P(DATA_AXIS))
        self.replicated = NamedSharding(mesh, P())
        if jax.process_count() > 1:
            warmup_collective(mesh)
        # The scanned-epoch dispatch gathers batches on device from the
        # row-sharded split cache; the trainer's scan body constrains
        # each gathered batch onto the data axis via this attribute.  It
        # must be set before the first compile: the trainer instance is
        # a jit static argnum (cache keyed by identity), so a later
        # mutation would not retrace.
        trainer.batch_constraint = self.batch_sharding

    def __getattr__(self, name):
        return getattr(self._trainer, name)

    # -- placement -----------------------------------------------------------

    def shard_batch(self, tree):
        """Lay a batch pytree over the data axis (leading dim).  Leaves
        whose leading dim doesn't divide (e.g. a remainder eval batch)
        are replicated instead — slower, never wrong."""
        n = self.mesh.shape[DATA_AXIS]

        def put(x):
            shape = getattr(x, "shape", ())
            sh = (self.batch_sharding
                  if shape and shape[0] % n == 0 else self.replicated)
            return put_global(x, sh)

        return jax.tree_util.tree_map(put, tree)

    def on_mesh(self, tree):
        """Replicate a state pytree onto the mesh unless it already lives
        there (step outputs do; fresh inits, host snapshots after an
        epoch retry, and checkpoint restores don't)."""
        leaves = jax.tree_util.tree_leaves(tree)
        if leaves:
            sh = getattr(leaves[0], "sharding", None)
            mesh = getattr(sh, "mesh", None)
            if mesh is not None and \
                    set(mesh.devices.flat) == set(self.mesh.devices.flat):
                return tree
        if jax.process_count() > 1:
            return jax.tree_util.tree_map(
                lambda x: put_global(x, self.replicated), tree)
        return jax.device_put(tree, self.replicated)

    # -- fit-loop surface ------------------------------------------------------

    def default_step_fn(self, state, batch, key, epoch):
        return self._trainer.default_step_fn(
            self.on_mesh(state), self.shard_batch(batch), key, epoch)

    def run_scan_chunk(self, state, arrays, idx_chunk, key, epoch):
        # the split cache is already mesh-placed when the module's
        # cache_sharding was set (cli/train.py does); on_mesh is a
        # pass-through then and a replication fallback otherwise
        return self._trainer.run_scan_chunk(
            self.on_mesh(state), self.on_mesh(arrays), idx_chunk, key, epoch)

    def eval_step(self, state, images, labels):
        if jax.process_count() > 1:
            # eval is NOT sharded by the samplers — every process reads
            # the full val/test batch.  Shard it here: each process keeps
            # only its contiguous row slice and contributes it as the
            # local portion of a data-axis-sharded global batch, so each
            # rank computes 1/K of the eval FLOPs and GSPMD's psum of the
            # batch-summed metrics (ops/metrics.evaluate_outputs) yields
            # the identical replicated totals the all-ranks-replicated
            # path produced.  Batches that don't divide the data axis
            # (the remainder batch of a split) fall back to replicated —
            # slower, never wrong.
            n = self.mesh.shape[DATA_AXIS]
            k = jax.process_count()
            b = images.shape[0]
            if b % n == 0:
                pi = jax.process_index()
                lo, hi = pi * (b // k), (pi + 1) * (b // k)
                images = put_global(np.asarray(images[lo:hi]),
                                    self.batch_sharding)
                labels = put_global(np.asarray(labels[lo:hi]),
                                    self.batch_sharding)
            else:
                images = put_global(np.asarray(images), self.replicated)
                labels = put_global(np.asarray(labels), self.replicated)
        else:
            images, labels = self.shard_batch((images, labels))
        return self._trainer.eval_step(self.on_mesh(state), images, labels)
