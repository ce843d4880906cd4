"""Multi-process (multi-host) data-parallel execution.

The reference's distributed training was documented broken
(rightLaneNetwork/README.md:275-277: "Distributed training is currently
not working because of custom samplers").  This module is the working
TPU-native story at the multi-HOST level: ``jax.distributed`` brings
every process's devices into one global mesh, each process feeds its own
per-process batch shard (sliced exactly like data/samplers.py slices per
shard), and XLA compiles the gradient all-reduce across hosts — ICI
within a slice, DCN between hosts; gloo when validating on CPU.

Runs the framework's real supervised train step (train/supervised.py) on
the global mesh and returns per-step losses, which are bitwise-identical
across processes (the loss is a replicated global value) and match a
single-process run of the same global batch — the property the test
suite gates by actually launching a 2-process cluster
(tests/test_multihost.py).

Worker CLI (one invocation per process):

    python -m sim2real_lane_segment_tpu.parallel.multihost \
        --process_id 0 --num_processes 2 --coordinator 127.0.0.1:19876

On a real TPU pod, omit ``--cpu`` and let each host discover its local
chips; on CPU, ``--cpu --local_devices k`` builds a k-device virtual
host (the same recipe as the multichip dry run, __graft_entry__.py).
"""
from __future__ import annotations

import argparse
import json
import os


def _force_cpu(local_devices: int) -> None:
    flags = os.environ.get("XLA_FLAGS", "")
    want = f"--xla_force_host_platform_device_count={local_devices}"
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " " + want).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")


def global_batch(step: int, batch_size: int, height: int, width: int):
    """Deterministic synthetic global batch — identical on every process
    and for the single-process parity run."""
    import numpy as np

    rng = np.random.default_rng(1000 + step)
    images = rng.integers(0, 255, (batch_size, height, width, 3),
                          dtype=np.uint8)
    labels = rng.integers(0, 4, (batch_size, height, width), dtype=np.uint8)
    return images, labels


def run_worker(*, process_id: int = 0, num_processes: int = 1,
               coordinator: str = "127.0.0.1:19876", steps: int = 3,
               per_device_batch: int = 2, height: int = 24,
               width: int = 32) -> list[float]:
    """Initialize the cluster, run `steps` global train steps, return the
    per-step losses (replicated global scalars)."""
    import jax

    if num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    import jax.numpy as jnp
    import numpy as np

    from ..core.dtypes import F32_POLICY
    from ..core.mesh import make_mesh
    from ..models.tiramisu import FCDenseNet
    from ..train.supervised import SupervisedTrainer
    from .sharding import replicate, shard_train_batch

    n_local = jax.local_device_count()
    n_global = jax.device_count()
    mesh = make_mesh(n_model=1)

    model = FCDenseNet(n_classes=4, down_blocks=(2, 2), up_blocks=(2, 2),
                       bottleneck_layers=2, growth_rate=8,
                       out_chans_first_conv=16, policy=F32_POLICY)
    trainer = SupervisedTrainer(num_cls=4, height=height, width=width,
                                augment=False, model=model)
    with jax.set_mesh(mesh):
        # same key on every process -> identical initial params; replicate
        state = trainer.init_state(jax.random.key(0))
        state = state.replace(
            params=replicate(mesh, jax.device_get(state.params)),
            batch_stats=replicate(mesh, jax.device_get(state.batch_stats)),
            opt_state=replicate(mesh, jax.device_get(state.opt_state)))

        bsz = per_device_batch * n_global
        lo = process_id * per_device_batch * n_local
        hi = lo + per_device_batch * n_local
        losses = []
        for step in range(steps):
            images, labels = global_batch(step, bsz, height, width)
            # each process contributes ITS slice of the global batch
            sharded = shard_train_batch(mesh, (images[lo:hi], labels[lo:hi]))
            state, logs = trainer.train_step(state, *sharded,
                                             jax.random.key(step),
                                             jnp.float32(1e-3))
            losses.append(float(logs["tr_loss"]))
        assert all(np.isfinite(l) for l in losses), losses
    return losses


def main(args=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--process_id", type=int, default=0)
    p.add_argument("--num_processes", type=int, default=1)
    p.add_argument("--coordinator", default="127.0.0.1:19876")
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--per_device_batch", type=int, default=2)
    p.add_argument("--cpu", action="store_true",
                   help="force a virtual CPU host (validation without TPUs)")
    p.add_argument("--local_devices", type=int, default=4,
                   help="virtual devices per process with --cpu")
    args = p.parse_args(args)
    if args.cpu:
        _force_cpu(args.local_devices)
    losses = run_worker(process_id=args.process_id,
                        num_processes=args.num_processes,
                        coordinator=args.coordinator, steps=args.steps,
                        per_device_batch=args.per_device_batch)
    import jax

    print(json.dumps({"process_id": args.process_id,
                      "local_devices": jax.local_device_count(),
                      "global_devices": jax.device_count(),
                      "losses": losses}))


if __name__ == "__main__":
    main()
